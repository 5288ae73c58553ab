"""Shared measurement constants — importable WITHOUT the engine.

``bench.py``'s module top level imports the full plans REGISTRY /
session chain (it has to — it runs queries), so any tool that imported
a constant *from bench* paid that whole import cost, and inherited any
registry import failure, before even parsing its own args (ADVICE r13
on ``tools/ab_compare.py``). Constants shared across measurement tools
live here instead; ``bench.py`` re-exports them so existing
``bench.BOX_LOAD_THRESHOLD_1M`` readers keep working and the
single-source-of-truth test (``tests/test_ab_compare.py``) still pins
the two views equal.
"""

#: 1-minute loadavg above which a measurement run is stamped
#: ``box_load_ok: false`` — on this 32-core box an idle baseline reads
#: well under 1; 2.0 (~6% busy) catches any concurrent
#: Spark/pytest/sweep session without false-tripping on the OS's own
#: background flutter.
BOX_LOAD_THRESHOLD_1M = 2.0
