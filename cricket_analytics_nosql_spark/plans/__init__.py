"""Logical-plan front-ends: compilers from foreign query IRs to
DataFrame plans (currently the reference's MongoDB aggregation
pipeline dialect)."""
