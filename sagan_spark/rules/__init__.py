from sagan_spark.rules.ir import (  # noqa: F401
    AfterSpec,
    ContentSpec,
    FlowSpec,
    JsonContentSpec,
    JsonMapSpec,
    JsonPcreSpec,
    MetaContentSpec,
    PcreSpec,
    PortGroup,
    RuleIR,
    ThresholdSpec,
    TimeSpec,
    XbitSpec,
)
from sagan_spark.rules.parser import parse_rule, parse_rules  # noqa: F401
