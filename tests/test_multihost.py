""">=2-process (DCN-style) fleet scaling via jax.distributed."""

import pytest


@pytest.mark.slow
def test_two_process_fleet_step():
    """Two real OS processes, each with 4 virtual devices, run the sharded
    fleet step over the 2-D (host x chip) mesh; the cross-host KKT
    reduction agrees and the run reports a sane rate (BASELINE '>=2 hosts'
    scaling row)."""
    from ad_mpc_tpu.parallel.multihost import launch

    line = launch(procs=2, batch=32, devices_per_proc=4, nodes=8, ticks=3,
                  port=47211, timeout=420.0)
    parts = dict(kv.split("=") for kv in line.split()[1:])
    assert int(parts["procs"]) == 2
    assert int(parts["devices"]) == 8
    assert float(parts["kkt"]) < 1e-3
    assert float(parts["solves_per_s"]) > 0
