"""Rule-compiler variable definitions for the fixture ruleset
(the reference takes these from sagan.yaml `vars`,
reference src/config-yaml.c + Var_To_Value src/util.c:744-783)."""

VARIABLES = {
    "USERS": "admin,root",
    "HOME_NET": "[10.0.0.0/8,192.168.0.0/16]",
    "EXTERNAL_NET": "any",
}
