"""End-to-end residual-model fitting pipeline.

Capability parity with the reference's fitting CLI
(``ros_gp_mpc/src/model_fitting/gp_fitting.py``): record -> body-frame
error targets -> prune -> cluster -> per-(dim, cluster) training-point
selection -> GP hyperparameter fit -> stacked ensemble, plus held-out
evaluation (nominal vs corrected RMSE, the ``gp_visualization.py`` check).
"""

from __future__ import annotations

import numpy as np

from ad_mpc_tpu.learned.dataset import ResidualDataset, select_training_points
from ad_mpc_tpu.learned.ensemble import GPEnsemble
from ad_mpc_tpu.learned.gp import fit_gp, predict_mean


def fit_gp_ensemble(
    dataset: ResidualDataset,
    out_idx=(7, 8, 9),
    feat_idx=(7, 8, 9),
    n_clusters: int = 1,
    n_points: int = 30,
    n_restarts: int = 3,
    selection: str = "kmeans",
    seed: int = 0,
    gmm_cache_path: str | None = None,
    top2_thresh: float = 0.2,
) -> GPEnsemble:
    """Fit one GP per (output dim, cluster) and stack into an ensemble.

    Clusters use the reference's soft top-2 GMM agency
    (``gp_common.py:254-262``): a sample whose second-best membership
    probability exceeds ``top2_thresh`` trains BOTH clusters, smoothing the
    boundaries. ``gmm_cache_path`` enables the gmm.pkl cache."""
    if n_clusters > 1:
        dataset.cluster(n_clusters, feat_idx=feat_idx, seed=seed,
                        cache_path=gmm_cache_path)
        agency = dataset.cluster_agency(feat_idx=feat_idx,
                                        top2_thresh=top2_thresh)
    else:
        dataset.cluster_labels = np.zeros(len(dataset.x_in), dtype=int)
        agency = {0: np.arange(len(dataset.x_in))}

    z_all = dataset.features(feat_idx)
    gps = [[] for _ in out_idx]
    for c in sorted(agency):
        idx = agency[c]
        z = z_all[idx]
        for i, dim in enumerate(out_idx):
            y = dataset.y[idx, dim]
            sel = select_training_points(z, y, n_points, method=selection,
                                         seed=seed)
            gps[i].append(fit_gp(z[sel], y[sel], n_restarts=n_restarts,
                                 seed=seed))
    return GPEnsemble.from_gps(gps, out_idx=out_idx, feat_idx=feat_idx)


def distill_gp(
    z_train,
    y_train,
    n_compact: int = 20,
    n_synthetic: int = 400,
    n_restarts: int = 3,
    seed: int = 0,
):
    """Dense-GP distillation (``gp_fitting.py:192-288``): fit a dense GP on
    the full training set, sample a synthetic dataset from its posterior
    mean on feature-space grid draws, then fit a compact GP on
    distance-maximizing synthetic points. Returns the compact
    :class:`~ad_mpc_tpu.learned.gp.GPParams`.
    """
    import jax

    z_train = np.asarray(z_train)
    y_train = np.asarray(y_train).reshape(-1)
    rng = np.random.default_rng(seed)

    dense = fit_gp(z_train, y_train, n_restarts=n_restarts, seed=seed)

    # Synthetic queries: uniform draws over the (slightly inflated) training
    # bounding box (gp_fitting.py's grid sampling).
    lo, hi = z_train.min(axis=0), z_train.max(axis=0)
    pad = 0.05 * (hi - lo + 1e-9)
    z_syn = rng.uniform(lo - pad, hi + pad, size=(n_synthetic, z_train.shape[1]))
    y_syn = np.asarray(jax.vmap(lambda z: predict_mean(dense, z))(z_syn))

    sel = select_training_points(z_syn, y_syn, n_compact, method="kmeans",
                                 seed=seed)
    return fit_gp(z_syn[sel], y_syn[sel], n_restarts=n_restarts, seed=seed)


def evaluate_ensemble(
    ens: GPEnsemble, test: ResidualDataset
) -> dict:
    """Held-out residual RMSE: nominal (predicting 0) vs GP-corrected
    (``gp_visualization.py:74-120`` capability)."""
    import jax

    from ad_mpc_tpu.learned.ensemble import predict

    z = test.features(ens.feat_idx)
    y = test.y[:, list(ens.out_idx)]
    mu = np.asarray(
        jax.vmap(lambda zz: predict(ens, zz))(np.asarray(z))
    )
    rmse_nominal = float(np.sqrt(np.mean(y**2)))
    rmse_gp = float(np.sqrt(np.mean((y - mu) ** 2)))
    return {
        "rmse_nominal": rmse_nominal,
        "rmse_gp": rmse_gp,
        "reduction": 1.0 - rmse_gp / max(rmse_nominal, 1e-12),
    }


def main(argv=None):
    """Fitting CLI — the ``gp_fitting.py`` driver role (``model_fitting/
    gp_fitting.py:88-127``): load (or record) a residual dataset, prune,
    cluster, fit the GP ensemble, evaluate held-out RMSE, and save the
    model keyed by git hash in the model registry."""
    import argparse
    import json

    from ad_mpc_tpu.utils import io

    ap = argparse.ArgumentParser(description=__doc__)
    ap.add_argument("--dataset", default=None,
                    help="dataset directory (utils.io registry); when "
                         "omitted, records fresh simulator flights")
    ap.add_argument("--model-name", default="gp_ensemble")
    ap.add_argument("--n-clusters", type=int, default=1)
    ap.add_argument("--n-points", type=int, default=30)
    ap.add_argument("--n-restarts", type=int, default=3)
    ap.add_argument("--selection", default="kmeans",
                    choices=["kmeans", "pca_cuboid", "histogram_median",
                             "random_inverse_density"])
    ap.add_argument("--x-features", type=int, nargs="+", default=[7, 8, 9])
    ap.add_argument("--y-dims", type=int, nargs="+", default=[7, 8, 9])
    ap.add_argument("--vel-cap", type=float, default=20.0)
    ap.add_argument("--hist-thresh", type=float, default=1e-3)
    ap.add_argument("--test-frac", type=float, default=0.2)
    ap.add_argument("--seed", type=int, default=0)
    ap.add_argument("--record-targets", type=int, default=10)
    args = ap.parse_args(argv)

    if args.dataset is not None:
        arrays = io.load_arrays(args.dataset)
    else:
        from ad_mpc_tpu.experiments.record_dataset import record_flights
        from ad_mpc_tpu.sim.simulator import DisturbanceConfig

        print(f"# recording {args.record_targets} drag-disturbed flights")
        arrays = record_flights(
            n_targets=args.record_targets,
            disturbances=DisturbanceConfig(drag=True),
            seed=args.seed,
        )

    ds = ResidualDataset.from_rollouts(
        arrays["x_in"], arrays["u"], arrays["x_out"], arrays["x_pred"],
        arrays["dt"],
    )
    ds = ds.prune(vel_cap=args.vel_cap, hist_thresh=args.hist_thresh,
                  vel_idx=tuple(args.y_dims))
    train, test = ds.split(test_frac=args.test_frac, seed=args.seed)

    ens = fit_gp_ensemble(
        train,
        out_idx=tuple(args.y_dims),
        feat_idx=tuple(args.x_features),
        n_clusters=args.n_clusters,
        n_points=args.n_points,
        n_restarts=args.n_restarts,
        selection=args.selection,
        seed=args.seed,
        gmm_cache_path=None,
    )
    metrics = evaluate_ensemble(ens, test)
    path = io.save_model(
        ens, args.model_name,
        metadata={
            "n_clusters": args.n_clusters, "n_points": args.n_points,
            "x_features": args.x_features, "y_dims": args.y_dims,
            "selection": args.selection, **metrics,
        },
    )
    print(json.dumps({"model_path": path, **metrics}))


if __name__ == "__main__":
    main()
