"""Pure-numpy geometry / cell-index kernels.

These are the vectorized cores that run inside Arrow-batched pandas UDFs on
executors ("never per-row Python", BASELINE.json:15). They have no Spark
dependency so they unit-test in milliseconds (SURVEY.md §7 phase 1).
"""
