"""Artifact writers preserving the reference's .npz contract.

The solver↔UI contract is 11 named .npz files per session directory
(SURVEY.md §2b.13; software.py:600-605, 806-811, 829-834, 866, 893-897,
931-936, 1041-1046, 1063-1068, 1100, 1135-1139):

    collocation_point_{1,2}.npz   {U, X_col, limit}
    solution_residual_1.npz       {r, t_vec, U, F}
    solution_residual_2.npz       {r, t, U, F}
    error_{1,2}.npz               {r, t, Error}
    loss_{1,2}.npz                {loss}           (stage 2 = concatenated)
    boundary_loss_{1,2}.npz       {loss_xy_l, loss_xy_r}
    frequency_spectrum.npz        {freq_x, freq_t, log_mag}

Unlike the reference (which np.savez's in place and lets the UI catch
half-written loads, figures.py:25-26), every write here is atomic:
tmp file + os.replace, so a polling reader never sees a torn file.
"""

from __future__ import annotations

import os
import tempfile
from pathlib import Path

import numpy as np


def atomic_savez(path, **arrays) -> None:
    """np.savez to a temp file in the same directory, then atomic rename."""
    path = Path(path)
    path.parent.mkdir(parents=True, exist_ok=True)
    fd, tmp = tempfile.mkstemp(dir=path.parent, suffix=".npz.tmp")
    try:
        with os.fdopen(fd, "wb") as f:
            np.savez(f, **arrays)
        os.replace(tmp, path)
    except BaseException:
        if os.path.exists(tmp):
            os.unlink(tmp)
        raise


def write_collocation(path, U, X_col, limit) -> None:
    """collocation_point_N.npz (software.py:600-605)."""
    atomic_savez(path, U=np.asarray(U), X_col=np.asarray(X_col),
                 limit=np.asarray(limit))


def write_solution_residual(path, r, t, U, F, stage: int) -> None:
    """solution_residual_N.npz — stage 1 historically uses key 't_vec',
    stage 2 't' (software.py:806-811 vs 1041-1046); figure loaders read only
    U and F so both spellings are honored for drop-in parity."""
    kw = {"r": np.asarray(r), "U": np.asarray(U), "F": np.asarray(F)}
    kw["t_vec" if stage == 1 else "t"] = np.asarray(t)
    atomic_savez(path, **kw)


def write_error(path, r, t, Error) -> None:
    atomic_savez(path, r=np.asarray(r), t=np.asarray(t), Error=np.asarray(Error))


def write_loss(path, loss) -> None:
    atomic_savez(path, loss=np.asarray(loss))


def write_boundary_loss(path, loss_xy_l, loss_xy_r) -> None:
    atomic_savez(path, loss_xy_l=np.asarray(loss_xy_l),
                 loss_xy_r=np.asarray(loss_xy_r))


def write_spectrum(path, freq_x, freq_t, log_mag) -> None:
    atomic_savez(path, freq_x=np.asarray(freq_x), freq_t=np.asarray(freq_t),
                 log_mag=np.asarray(log_mag))


ARTIFACT_NAMES = [
    "collocation_point_1.npz",
    "collocation_point_2.npz",
    "solution_residual_1.npz",
    "solution_residual_2.npz",
    "error_1.npz",
    "error_2.npz",
    "loss_1.npz",
    "loss_2.npz",
    "boundary_loss_1.npz",
    "boundary_loss_2.npz",
    "frequency_spectrum.npz",
]
