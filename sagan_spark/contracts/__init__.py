"""Driver-contract package: the 185+ queries()/oracle_sql() gate
surface, split per family out of __spark_entry__.py (r5).  The driver
still imports __spark_entry__ — that file re-exports queries(),
oracle_sql() and entry() unchanged."""
