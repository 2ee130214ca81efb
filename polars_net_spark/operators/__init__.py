"""Custom operator compositions Spark lacks natively (SURVEY §7.3).

Each is library code over DataFrame ops — no custom Catalyst rules — designed
to keep work distributed (no driver-side materialization on any lazy path).
"""
