"""Mechanical end-of-round compile freeze (round-3 VERDICT #10).

The documented TPU-worker wedge trigger is a CLIENT-INTERRUPTED remote
kernel compile (docs/ROUND3.md campaign log: both 2026-08-18/19 wedges were
killed compiles; recovery takes 25-60 min — longer than the driver's
capture window). The end-of-round discipline is therefore "no new kernel
shapes in the last ~45 minutes"; this module makes that rule enforced
instead of remembered:

    make freeze     # touch the marker: experiment scripts refuse to start
    make unfreeze   # lift it

Every script whose job is to compile NEW kernel shapes (profilers, kernel
experiments, ladder sweeps) calls ``assert_not_frozen(ctx)`` before first
device use and exits loudly while frozen. ``bench.py`` and
``scripts/tpu_parity.py`` are deliberately EXEMPT: they run the fixed,
cache-warm benchmark/parity shapes and are exactly what the freeze window
is protecting.

Override for a deliberate exception: FREEZE_OVERRIDE=1.
"""

from __future__ import annotations

import os
import sys

# Marker lives at the REPO ROOT (not build/): `make clean` wipes build/,
# and silently disarming an active end-of-round freeze is exactly the
# footgun this module exists to remove (round-4 ADVICE).
FREEZE_PATH = os.path.join(os.path.dirname(__file__), "..", "..", ".freeze")


def freeze_active() -> bool:
    return os.path.exists(os.path.abspath(FREEZE_PATH))


def assert_not_frozen(context: str) -> None:
    """Exit (rc=3) if the compile freeze is armed.

    Called by scripts that trigger new remote kernel compiles; during the
    end-of-round freeze those are the wedge risk the rule exists to stop.
    """
    if not freeze_active():
        return
    if os.environ.get("FREEZE_OVERRIDE") == "1":
        print(f"# freeze override: {context} proceeding despite the "
              "compile freeze", file=sys.stderr)
        return
    print(
        f"# COMPILE FREEZE ACTIVE — refusing to start {context!r}.\n"
        "# New remote kernel compiles are the documented worker-wedge\n"
        "# trigger; the end-of-round window is reserved for the driver\n"
        "# bench capture. Lift with `make unfreeze` or force with\n"
        "# FREEZE_OVERRIDE=1 if you are sure.",
        file=sys.stderr,
    )
    raise SystemExit(3)
