"""Driver entry points: entry() compiles and runs; dryrun_multichip on 8 fake devices.

These are the two functions the build driver exercises; breaking them breaks the
round's validation, so they get their own regression tests.
"""
import sys
from pathlib import Path

import numpy as np
import pytest

import jax

sys.path.insert(0, str(Path(__file__).resolve().parent.parent))


@pytest.mark.slow
def test_entry_compiles_and_runs():
    from __graft_entry__ import entry

    fn, args = entry()
    out = jax.jit(fn)(*args)
    out = jax.device_get(out)
    assert out["logits"].shape == (8, 32)
    assert out["msp"].shape == (8,)
    assert out["energy"].shape == (8,)
    assert np.isfinite(out["logits"]).all()
    # OOD score conventions: msp in [0,1)
    assert (out["msp"] >= 0).all() and (out["msp"] <= 1).all()


def test_dryrun_multichip_8(capsys):
    from __graft_entry__ import dryrun_multichip

    dryrun_multichip(8)
    assert "OK" in capsys.readouterr().out


def test_dryrun_multichip_odd_device_count(capsys):
    from __graft_entry__ import dryrun_multichip

    dryrun_multichip(1)  # degenerate mesh still works
    assert "OK" in capsys.readouterr().out
