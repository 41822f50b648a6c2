"""End-to-end learned-model flagship regression: record -> fit -> deploy.

Guards the reference's headline capability (``data_driven_mpc/README.md:
283-296``: GP residual correction halves closed-loop tracking error under
unmodeled drag): the FITTED ensemble — produced by this framework's own
record/prune/fit pipeline, not a hand-built synthetic one — must beat the
nominal model in closed loop through the full QuadMPC GP mode.

The committed full-scale artifact lives in
``results/experiments/gp_flagship/sweep_summary.json`` (3 families x 3
speeds); this test reproduces the result at reduced scale so a regression
in any pipeline stage (recorder, dataset, fit, ensemble deployment,
solver) fails the suite.
"""

import numpy as np
import pytest

pytestmark = pytest.mark.slow


def test_fitted_gp_beats_nominal_closed_loop():
    from ad_mpc_tpu.experiments.quad_trajectory_test import run_tracking
    from ad_mpc_tpu.experiments.record_dataset import record_flights
    from ad_mpc_tpu.learned.dataset import ResidualDataset
    from ad_mpc_tpu.learned.fitting import fit_gp_ensemble
    from ad_mpc_tpu.learned.rdrv import fit_rdrv
    from ad_mpc_tpu.sim.simulator import DisturbanceConfig

    drag = DisturbanceConfig(drag=True)

    # 1. Record drag-disturbed flights with the nominal MPC.
    arrays = record_flights(n_targets=8, box=6.0, disturbances=drag, seed=3)
    ds = ResidualDataset.from_rollouts(
        arrays["x_in"], arrays["u"], arrays["x_out"], arrays["x_pred"],
        arrays["dt"],
    ).prune()

    # 2. Fit a compact GP ensemble + the RDRv drag matrix.
    train, _ = ds.split(test_frac=0.15, seed=0)
    ens = fit_gp_ensemble(train, n_clusters=1, n_points=30, n_restarts=2)
    rdrv_d = fit_rdrv(train)
    assert np.all(np.diag(rdrv_d) < 0), (
        f"fitted drag matrix should be dissipative: {np.diag(rdrv_d)}"
    )

    # 3. Closed loop on an operating point where drag bites (measured r5:
    #    nominal 0.28 m vs ideal 0.0009 m at random@3 under drag).
    kw = dict(traj_type="random", v_max=3.0, disturbances=drag, seed=0)
    nom = run_tracking(**kw)
    gp = run_tracking(ensemble=ens, **kw)

    assert np.isfinite(gp.rmse) and np.isfinite(nom.rmse)
    assert gp.rmse < 0.8 * nom.rmse, (
        f"fitted GP must reduce closed-loop RMSE by >20%: "
        f"nominal {nom.rmse:.4f} vs gp {gp.rmse:.4f}"
    )
