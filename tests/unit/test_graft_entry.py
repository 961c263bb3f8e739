"""Regression tests for the driver hooks (__graft_entry__)."""

import sys

import jax
import pytest

sys.path.insert(0, "/root/repo")
import __graft_entry__ as graft


def test_entry_compiles_and_prices():
    fn, args = graft.entry()
    price = float(jax.jit(fn)(*args))
    assert 5.0 < price < 20.0  # sane ATM Heston call price


def test_dryrun_multichip_8():
    graft.dryrun_multichip(8)


def test_dryrun_multichip_2():
    graft.dryrun_multichip(2)
