"""The driver contract: entry() compiles single-chip; dryrun_multichip runs
a full sharded train step on the virtual 8-device CPU mesh."""

import sys
import os

import pytest

import jax

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

import __graft_entry__ as graft

# Long-running evidence tests (real 2-process clusters / full
# training loops / driver dryruns): excluded from the fast dev loop
# via `pytest -m "not slow"`; the full gate always runs them.
pytestmark = pytest.mark.slow



def test_entry_jits():
    fn, args = graft.entry()
    out = jax.jit(fn)(*args)
    assert out.shape == (4, 128, 48, 3)


def test_dryrun_multichip_8():
    # Same path the driver runs (flagship dims, train + parity + sharded
    # generation); one bar of sequence keeps the suite fast — the driver's
    # call uses the full 8-bar seq_len.
    graft.dryrun_multichip(8, bars_per_seq=1)


def test_dryrun_multichip_non_dividing_device_count():
    # 6 devices don't divide 8: the batch must round to a 6-multiple (12)
    # instead of failing the P("data") sharding.
    graft.dryrun_multichip(6, bars_per_seq=1)


def test_import_raises_cpu_collective_watchdog():
    """Importing the driver module must lift XLA:CPU's 40-second
    collective-rendezvous kill switch BEFORE backend init: the full
    B=16 x T=128 dryrun geometry legitimately exceeds it on small hosts
    (a partition stuck timesharing one core was killed mid-AllGather)."""
    flags = os.environ.get("XLA_FLAGS", "")
    assert "--xla_cpu_collective_call_terminate_timeout_seconds" in flags
    assert "--xla_cpu_collective_call_warn_stuck_timeout_seconds" in flags
