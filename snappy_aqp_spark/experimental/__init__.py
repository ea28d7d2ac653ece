"""Quarantine namespace for code this environment cannot execute.

Policy (round-6 VERDICT): never-executed code must not ship as a claimed
feature. Modules here are complete, reviewed, and oracle-equipped, but
their runtime path is blocked by a missing environment dependency — each
module's docstring names the exact blocker and the promotion criterion
(execute against its oracle in an environment that has the dependency,
then move it back to its real package).

Current residents:

- ``tws_reservoir`` — Spark 4 ``transformWithState`` stratified reservoir;
  blocked on the TWS Python worker's protobuf dependency (absent here,
  installs not permitted). Batch-equivalent semantics ARE covered by the
  executed k-min-hash fold in sampling/samplers.py and the
  applyInPandasWithState operator in streaming/stateful.py.
"""
