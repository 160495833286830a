"""Query plans: reference-parity workloads, relational extensions, and
LLM-pipeline operators, assembled into the driver-facing registry."""
