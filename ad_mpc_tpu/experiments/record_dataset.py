"""Dataset recording: aggressive random point-to-point flights.

Capability parity with ``src/experiments/point_tracking_and_record.py``:
fly the quad between random targets under the disturbance suite, record
(state_in, input, state_out, nominal x_pred, dt) tuples for residual-model
fitting, with warm-started solver, emergency state reset, and target
resampling. The recorded tuples feed :class:`ResidualDataset`.
"""

from __future__ import annotations

import jax
import jax.numpy as jnp
import numpy as np

from ad_mpc_tpu.control.mpc import QuadMPC, quad_spec
from ad_mpc_tpu.models.quadrotor import QuadrotorParams, hover_input, quad_dynamics
from ad_mpc_tpu.ops.integrators import discretize
from ad_mpc_tpu.sim.simulator import DisturbanceConfig, QuadrotorSim
from ad_mpc_tpu.utils import io


def record_flights(
    n_targets: int = 10,
    box: float = 4.0,
    control_period: float = 0.02,
    disturbances: DisturbanceConfig = DisturbanceConfig(drag=True),
    seed: int = 0,
    dataset_name: str | None = None,
    verbose: bool = False,
):
    """Returns dict of recorded arrays (and saves them when dataset_name)."""
    params = QuadrotorParams()
    spec = quad_spec(n_nodes=10, qp_iters=12)
    mpc = QuadMPC(spec=spec, params=params, dtype=jnp.float32)
    sim = QuadrotorSim(params=params, disturbances=disturbances, sim_dt=1e-3)

    # Nominal one-control-period predictor for the residual targets.
    F_nom = jax.jit(
        discretize(lambda x, u: quad_dynamics(x, u, params), control_period, 4)
    )

    rng = np.random.default_rng(seed)
    key = jax.random.PRNGKey(seed)

    x = jnp.zeros(13).at[3].set(1.0)
    rec = {k: [] for k in ("x_in", "u", "x_out", "x_pred", "dt")}

    for tgt_i in range(n_targets):
        target = np.zeros(13)
        target[3] = 1.0
        target[:3] = rng.uniform(-box, box, 3)
        target[2] = abs(target[2]) + 0.5
        mpc.set_reference(
            np.tile(target, (spec.n_nodes + 1, 1)),
            np.tile(hover_input(params), (spec.n_nodes, 1)),
        )
        for _ in range(int(2.0 / control_period)):
            us, xs = mpc.optimize(x)
            u0 = us[0]
            x_next, key = sim.step(x, u0, key, control_period)

            # Emergency reset on divergence BEFORE recording the sample —
            # a non-finite x_out would poison the residual dataset
            # (point_tracking_and_record.py:203-206).
            if not np.all(np.isfinite(np.asarray(x_next))) or np.linalg.norm(
                np.asarray(x_next[:3])
            ) > 3 * box:
                x = jnp.zeros(13).at[3].set(1.0)
                mpc.reset()
                break

            rec["x_in"].append(np.asarray(x))
            rec["u"].append(np.asarray(u0))
            rec["x_out"].append(np.asarray(x_next))
            rec["x_pred"].append(np.asarray(F_nom(x, u0)))
            rec["dt"].append(control_period)

            x = x_next
            if np.linalg.norm(np.asarray(x[:3]) - target[:3]) < 0.15:
                break
        if verbose:
            print(f"target {tgt_i}: reached "
                  f"{np.linalg.norm(np.asarray(x[:3]) - target[:3]):.3f} m, "
                  f"{len(rec['dt'])} samples so far")

    arrays = {k: np.asarray(v) for k, v in rec.items()}
    if dataset_name:
        d = io.dataset_dir(
            dataset_name, "train",
            {"disturbances": list(map(bool, disturbances)), "seed": seed},
            create=True,
        )
        io.save_arrays(d, **arrays)
    return arrays


if __name__ == "__main__":
    from ad_mpc_tpu.utils.platform import force_cpu

    force_cpu()
    arrays = record_flights(n_targets=5, verbose=True)
    print({k: v.shape for k, v in arrays.items()})
