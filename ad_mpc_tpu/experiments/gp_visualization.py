"""GP model-quality visualization experiment.

Capability parity with ``ros_gp_mpc/src/model_fitting/gp_visualization.py``:
fit a residual GP ensemble on a recorded dataset, evaluate on the held-out
split, and plot nominal vs GP-corrected residuals with +-3 sigma bands.
"""

from __future__ import annotations

import numpy as np


def run_gp_visualization(
    dataset=None,
    out_idx=(7, 8, 9),
    feat_idx=(7, 8, 9),
    n_points: int = 25,
    save_path: str | None = None,
    seed: int = 0,
):
    """Returns (metrics dict, figure). When ``dataset`` is None, records a
    fresh one from short simulator flights (the offline pipeline of
    ``record_dataset``)."""
    import jax

    from ad_mpc_tpu.learned.ensemble import predict, predict_variance
    from ad_mpc_tpu.learned.fitting import evaluate_ensemble, fit_gp_ensemble
    from ad_mpc_tpu.utils.visualization import gp_inference_plot

    if dataset is None:
        from ad_mpc_tpu.experiments.record_dataset import record_flights
        from ad_mpc_tpu.learned.dataset import ResidualDataset

        arrays = record_flights(n_targets=6, seed=seed)
        dataset = ResidualDataset.from_rollouts(
            arrays["x_in"], arrays["u"], arrays["x_out"],
            arrays["x_pred"], arrays["dt"],
        )

    train, test = dataset.split(test_frac=0.3, seed=seed)
    ens = fit_gp_ensemble(
        train, out_idx=out_idx, feat_idx=feat_idx, n_points=n_points,
        seed=seed,
    )
    metrics = evaluate_ensemble(ens, test)

    z = test.features(feat_idx)
    y = test.y[:, list(out_idx)]
    mu = np.asarray(jax.vmap(lambda zz: predict(ens, zz))(np.asarray(z)))
    try:
        var = np.asarray(
            jax.vmap(lambda zz: predict_variance(ens, zz))(np.asarray(z))
        )
    except Exception:
        var = None
    fig = gp_inference_plot(
        z, y, mu, var=var,
        dim_names=[f"v_dot[{i}]" for i in out_idx],
        save_path=save_path,
    )
    return metrics, fig


def main():
    import argparse

    from ad_mpc_tpu.utils.platform import add_platform_arg, apply_platform_arg

    ap = argparse.ArgumentParser()
    ap.add_argument("--out", default="gp_visualization.png")
    add_platform_arg(ap)
    args = ap.parse_args()
    apply_platform_arg(args)

    metrics, _ = run_gp_visualization(save_path=args.out)
    print(
        f"nominal RMSE {metrics['rmse_nominal']:.4f}  "
        f"GP RMSE {metrics['rmse_gp']:.4f}  "
        f"reduction {100 * metrics['reduction']:.1f}%  -> {args.out}"
    )


if __name__ == "__main__":
    main()
