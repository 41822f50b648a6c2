"""Dataset / model IO with metadata-keyed directories.

Capability parity with the reference's IO registry
(``ros_gp_mpc/src/utils/utils.py:61-235``): datasets live under
``data/<name>/<split>/`` keyed by a metadata dict, fitted models under
``results/model_fitting/<git_hash>/<model_name>/`` so a model is traceable
to the exact code state that produced it. Arrays are stored as ``.npz``
(replacing the reference's jsonified-CSV round trip) with a ``meta.json``
sidecar.
"""

from __future__ import annotations

import json
import os
import pickle
import subprocess

import numpy as np

DATA_ROOT = os.environ.get(
    "AD_MPC_TPU_DATA_DIR",
    os.path.join(os.path.dirname(os.path.dirname(os.path.dirname(
        os.path.abspath(__file__)))), "data"),
)
RESULTS_ROOT = os.environ.get(
    "AD_MPC_TPU_RESULTS_DIR",
    os.path.join(os.path.dirname(os.path.dirname(os.path.dirname(
        os.path.abspath(__file__)))), "results"),
)


def git_hash(short: bool = True) -> str:
    """Current repo git hash (model versioning key, ``utils.py:175-188``)."""
    try:
        cmd = ["git", "rev-parse"] + (["--short"] if short else []) + ["HEAD"]
        out = subprocess.run(
            cmd, capture_output=True, text=True,
            cwd=os.path.dirname(os.path.abspath(__file__)),
        )
        h = out.stdout.strip()
        return h if h else "nogit"
    except Exception:
        return "nogit"


def _meta_matches(meta_path: str, metadata: dict) -> bool:
    try:
        with open(meta_path) as f:
            stored = json.load(f)
        return all(stored.get(k) == v for k, v in metadata.items())
    except FileNotFoundError:
        return False


def dataset_dir(name: str, split: str = "train", metadata: dict | None = None,
                create: bool = False) -> str:
    """Locate (or create) the dataset directory matching the metadata dict
    (``get_data_dir_and_file``, ``utils.py:78-172``)."""
    base = os.path.join(DATA_ROOT, name, split)
    if metadata is None:
        metadata = {}
    if os.path.isdir(base):
        for sub in sorted(os.listdir(base)):
            d = os.path.join(base, sub)
            if _meta_matches(os.path.join(d, "meta.json"), metadata):
                return d
    if not create:
        raise FileNotFoundError(
            f"no dataset '{name}/{split}' matching {metadata}"
        )
    idx = len(os.listdir(base)) if os.path.isdir(base) else 0
    d = os.path.join(base, f"v{idx:03d}")
    os.makedirs(d, exist_ok=True)
    with open(os.path.join(d, "meta.json"), "w") as f:
        json.dump(metadata, f, indent=1)
    return d


def save_arrays(directory: str, **arrays) -> str:
    path = os.path.join(directory, "data.npz")
    np.savez_compressed(path, **arrays)
    return path


def load_arrays(directory: str) -> dict:
    with np.load(os.path.join(directory, "data.npz")) as z:
        return {k: z[k] for k in z.files}


def model_dir(model_name: str, create: bool = False) -> str:
    """``results/model_fitting/<git_hash>/<model_name>/``
    (``utils.py:175-188``)."""
    d = os.path.join(RESULTS_ROOT, "model_fitting", git_hash(), model_name)
    if create:
        os.makedirs(d, exist_ok=True)
    return d


def save_model(obj, model_name: str, metadata: dict | None = None) -> str:
    """Pickle a fitted model (GP ensemble / RDRv matrix) with metadata
    (``gp.py:489-533`` capability)."""
    d = model_dir(model_name, create=True)
    with open(os.path.join(d, "model.pkl"), "wb") as f:
        pickle.dump(obj, f)
    if metadata:
        with open(os.path.join(d, "meta.json"), "w") as f:
            json.dump(metadata, f, indent=1)
    return d


def load_model(model_name: str, git_rev: str | None = None):
    base = os.path.join(RESULTS_ROOT, "model_fitting")
    rev = git_rev or git_hash()
    path = os.path.join(base, rev, model_name, "model.pkl")
    if not os.path.exists(path) and git_rev is None:
        # Fall back to any revision holding this model (latest mtime).
        cands = []
        if os.path.isdir(base):
            for r in os.listdir(base):
                p = os.path.join(base, r, model_name, "model.pkl")
                if os.path.exists(p):
                    cands.append(p)
        if cands:
            path = max(cands, key=os.path.getmtime)
    with open(path, "rb") as f:
        return pickle.load(f)
