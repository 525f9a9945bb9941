"""Range-statistics numeric parity against the reference C math."""

import random
import subprocess
from pathlib import Path

import pytest

from gnuais_tpu.runtime.metrics import RangeTracker, maidenhead_km_distance

HARNESS = Path(__file__).parent.parent / ".oracle" / "build" / "range_harness"


@pytest.fixture()
def harness(oracle_bin):
    # oracle_bin fixture triggers the build that also produces the
    # range harness
    if not HARNESS.exists():
        pytest.skip("range harness unavailable")
    return HARNESS


def _ref(harness, mylat, mylng, pts):
    args = [str(harness), str(mylat), str(mylng)]
    for p in pts:
        args += [str(p[0]), str(p[1])]
    return float(subprocess.run(args, capture_output=True,
                                text=True).stdout)


def test_range_fuzz_parity(harness):
    rng = random.Random(7)
    for _ in range(40):
        mylat = rng.uniform(-80, 80)
        mylng = rng.uniform(-179, 179)
        pts = [(rng.uniform(-80, 80), rng.uniform(-179, 179))
               for _ in range(4)]
        want = _ref(harness, mylat, mylng, pts)
        rt = RangeTracker("A", mylat, mylng)
        for p in pts:
            rt.update(*p)
        # remaining delta comes from libm sinf/cosf vs correctly
        # rounded float32: bounded well below the displayed %.1f km
        assert abs(rt.best_range - want) < 0.02, (mylat, mylng, pts)


def test_bad_fix_filters(harness):
    rt = RangeTracker("A", 60.0, 25.0)
    rt.update(91.0, 10.0)      # out-of-range lat
    rt.update(0.0, 0.0)        # null island
    rt.update(10.0, 200.0)     # out-of-range lon
    assert rt.best_range == 0.0
    assert _ref(harness, 60.0, 25.0,
                [(91.0, 10.0), (0.0, 0.0), (10.0, 200.0)]) == 0.0


def test_log_and_reset():
    rt = RangeTracker("A", 60.0, 25.0)
    rt.update(61.0, 25.0)
    msg = rt.log_and_reset()
    assert msg and msg.startswith("Best range ch A:") and "km" in msg
    assert rt.best_range == 0.0
    assert rt.log_and_reset() is None   # below the 0.1 km floor
