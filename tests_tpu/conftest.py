"""TPU smoke tier: runs on the REAL chip (no platform forcing).

The main suite (tests/) forces a virtual 8-device CPU mesh, so the
Mosaic-compiled Pallas kernels and the tunnel dispatch rules the perf story
depends on are never exercised there.  This tier compiles and executes the
real kernels once, small shapes only:

    python -m pytest tests_tpu -q

First run pays tunnel compiles (minutes); the persistent compilation cache
(.jax_cache/) makes later runs take seconds.
"""
