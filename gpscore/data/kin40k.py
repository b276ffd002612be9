"""KIN40K loading with the reference's subsampling protocol.

The reference reads `kin40k.xlsx` from a hardcoded Windows path
(`kin40k-FULL-compare.py:141,197-200`) with sheets trainx/trainy/testx/testy
(10,000 train rows, 8-d inputs; 500 test rows used). Here:

- :func:`load_kin40k` reads an ``.npz`` (keys trainx/trainy/testx/testy) or a
  directory of ``.csv`` files — portable formats instead of xlsx. If no file is
  available it synthesizes a KIN40K-shaped dataset (same sizes/dimension,
  nonlinear kinematics-like response) so every experiment and benchmark runs
  hermetically.
- :func:`kin40k_replicate_split` reproduces the per-replicate protocol
  (`kin40k-FULL-compare.py:194-214`): sample 500+300 of the 10,000-row pool
  without replacement, carve 300 into validation, take the first 500 test rows.
"""

from __future__ import annotations

import os
from typing import NamedTuple, Optional

import jax
import jax.numpy as jnp
import numpy as np


class Kin40k(NamedTuple):
    train_x: np.ndarray  # [N_pool, 8]
    train_y: np.ndarray  # [N_pool]
    test_x: np.ndarray  # [N_test, 8]
    test_y: np.ndarray  # [N_test]


class ReplicateSplit(NamedTuple):
    train_x: jnp.ndarray
    train_y: jnp.ndarray
    va_x: jnp.ndarray
    va_y: jnp.ndarray
    test_x: jnp.ndarray
    test_y: jnp.ndarray


def synthesize_kin40k_like(
    seed: int = 0, n_pool: int = 10_000, n_test: int = 5_000, d: int = 8
) -> Kin40k:
    """Hermetic stand-in with KIN40K's shape and a smooth nonlinear response
    (robot-arm-like composition of trigonometric link terms + noise), standardized
    like the published dataset."""
    rng = np.random.default_rng(seed)
    X = rng.uniform(-1.0, 1.0, size=(n_pool + n_test, d)).astype(np.float32)

    def response(X):
        # Kinematic-flavoured: distance of an articulated 4-link arm endpoint.
        angles = np.cumsum(X[:, :4] * np.pi, axis=1)
        lengths = 0.5 + 0.5 * np.abs(X[:, 4:8])
        ex = np.sum(lengths * np.cos(angles), axis=1)
        ey = np.sum(lengths * np.sin(angles), axis=1)
        return np.sqrt(ex**2 + ey**2).astype(np.float32)

    y = response(X) + 0.05 * rng.standard_normal(n_pool + n_test).astype(np.float32)
    y = (y - y.mean()) / y.std()
    return Kin40k(
        train_x=X[:n_pool],
        train_y=y[:n_pool],
        test_x=X[n_pool:],
        test_y=y[n_pool:],
    )


def load_kin40k(path: Optional[str] = None) -> Kin40k:
    """Load from ``path`` (``.npz`` or directory of csv) or fall back to the
    synthetic stand-in. Env var ``GPSCORE_KIN40K`` overrides."""
    path = path or os.environ.get("GPSCORE_KIN40K")
    if path and os.path.exists(path):
        if path.endswith(".xlsx"):
            # The reference's format (`kin40k-FULL-compare.py:197-200`): sheets
            # trainx/trainy/testx/testy. pandas when it has an xlsx engine
            # (openpyxl/calamine — widest format coverage), else the hermetic
            # stdlib reader (gpscore.data.xlsx_lite) so the path works — and
            # is testable — with zero optional dependencies.
            names = ["trainx", "trainy", "testx", "testy"]
            try:
                import pandas as pd

                # Single read: pd.read_excel re-parses the whole workbook per
                # call, so fetch all four sheets at once.
                sheets = pd.read_excel(path, sheet_name=names, header=None)
            except ImportError:
                from gpscore.data.xlsx_lite import read_sheets

                sheets = read_sheets(path, names)
            arr = {k: np.asarray(v, np.float32) for k, v in sheets.items()}
            return Kin40k(
                arr["trainx"],
                arr["trainy"].reshape(-1),
                arr["testx"],
                arr["testy"].reshape(-1),
            )
        if path.endswith(".npz"):
            z = np.load(path)
            return Kin40k(
                np.asarray(z["trainx"], np.float32),
                np.asarray(z["trainy"], np.float32).reshape(-1),
                np.asarray(z["testx"], np.float32),
                np.asarray(z["testy"], np.float32).reshape(-1),
            )
        if os.path.isdir(path):
            def rd(name):
                return np.loadtxt(
                    os.path.join(path, f"{name}.csv"), delimiter=",", dtype=np.float32
                )

            return Kin40k(rd("trainx"), rd("trainy").reshape(-1), rd("testx"), rd("testy").reshape(-1))
        raise ValueError(f"unsupported kin40k path: {path}")
    return synthesize_kin40k_like()


def kin40k_replicate_split(
    data: Kin40k,
    replicate: int,
    n_subsample: int = 500,
    n_va: int = 300,
    n_test: int = 500,
) -> ReplicateSplit:
    """Per-replicate subsampling (`kin40k-FULL-compare.py:194-214`): seed j*100,
    draw n_subsample+n_va pool rows without replacement, then carve n_va of those
    into validation; first n_test test rows."""
    rng = np.random.default_rng(replicate * 100)
    sam = rng.choice(data.train_x.shape[0], size=n_subsample + n_va, replace=False)
    full_x = data.train_x[sam]
    full_y = data.train_y[sam]
    va_idx = rng.choice(full_x.shape[0], size=n_va, replace=False)
    mask = np.ones(full_x.shape[0], dtype=bool)
    mask[va_idx] = False
    return ReplicateSplit(
        train_x=jnp.asarray(full_x[mask]),
        train_y=jnp.asarray(full_y[mask]),
        va_x=jnp.asarray(full_x[va_idx]),
        va_y=jnp.asarray(full_y[va_idx]),
        test_x=jnp.asarray(data.test_x[:n_test]),
        test_y=jnp.asarray(data.test_y[:n_test]),
    )
