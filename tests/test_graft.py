"""Driver contracts: __graft_entry__.entry compiles, dryrun_multichip runs."""

import os
import sys

import jax
import pytest

sys.path.insert(0, os.path.join(os.path.dirname(__file__), ".."))

import __graft_entry__ as graft

pytestmark = pytest.mark.skipif(
    len(jax.devices()) < 8, reason="needs 8 virtual devices"
)


def test_entry_lowers():
    fn, args = graft.entry()
    # lowering validates tracing + sharding without paying interpret-mode
    # execution of an 800x600x500 render on CPU
    jax.jit(fn).lower(*args)


def test_dryrun_multichip_executes():
    graft.dryrun_multichip(8)


def test_dryrun_multichip_other_sizes():
    graft.dryrun_multichip(4)
    graft.dryrun_multichip(2)
