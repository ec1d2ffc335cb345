#!/usr/bin/env python
"""One-shot extended autotune probe for BASELINE config 4 (1080p RK4 +
adaptive + disk): narrow tiles for early-exit locality + denser cadence
cross. Writes the winner into .bhr_autotune.json (current committed
winner included as a candidate so the cache never regresses)."""
import json
import pathlib
import sys

REPO = pathlib.Path(__file__).resolve().parent.parent
sys.path.insert(0, str(REPO))

from bhr_tpu.ops.trace import TraceConfig
from bhr_tpu.utils.autotune import autotune

cfg = TraceConfig(integrator="rk4", adaptive=True, disk=True)
cands = [{"tile": (8, 512), "early_exit_every": 50, "steps_per_check": 50}]
for t in ((8, 128), (8, 256), (16, 128), (16, 256)):
    for eee, spc in ((25, 25), (50, 50), (100, 50)):
        cands.append({"tile": t, "early_exit_every": eee, "steps_per_check": spc})
for t in ((8, 640), (16, 512)):
    for eee, spc in ((25, 25), (100, 50)):
        cands.append({"tile": t, "early_exit_every": eee, "steps_per_check": spc})
best = autotune(1920, 1080, 500, fast_math=True, config=cfg,
                candidates=cands, force=True)
print(json.dumps(best))
