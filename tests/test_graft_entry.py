"""Driver entry-point tests: single-chip compile check + multi-chip dry run."""
import sys
from pathlib import Path

import jax

sys.path.insert(0, str(Path(__file__).parent.parent))

import __graft_entry__ as graft


def test_entry_compiles():
    fn, args = graft.entry()
    out = jax.jit(fn)(*args)
    assert out.shape == (1, 32, 35008)  # 19M ja config, padded vocab


def test_dryrun_multichip_8():
    graft.dryrun_multichip(8)


def test_dryrun_multichip_4():
    graft.dryrun_multichip(4)
