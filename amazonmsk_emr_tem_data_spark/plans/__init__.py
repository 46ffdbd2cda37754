from .inspect import (  # noqa: F401
    explain_str,
    plan_facts,
    registry_plan_report,
)
