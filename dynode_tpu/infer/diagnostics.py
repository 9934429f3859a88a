"""MCMC diagnostics: effective sample size, split-Rhat, HDI, summaries.

Standalone replacements for the arviz/numpyro diagnostics the reference
leans on for fit assessment (reference exports fits via arviz --
src/dynode/infer/inference.py:208-241). ESS uses Geyer's initial monotone
positive sequence over FFT autocovariances; Rhat is rank-free split-Rhat.
"""

from typing import Dict

import numpy as np


def _autocovariance(x: np.ndarray) -> np.ndarray:
    """Biased autocovariance per chain via FFT. x: (chains, draws)."""
    n = x.shape[-1]
    x = x - x.mean(axis=-1, keepdims=True)
    size = 2 ** int(np.ceil(np.log2(2 * n)))
    f = np.fft.rfft(x, size, axis=-1)
    acov = np.fft.irfft(f * np.conjugate(f), size, axis=-1)[..., :n]
    return np.real(acov) / n


def effective_sample_size(x: np.ndarray) -> float:
    """ESS of a (chains, draws) scalar-parameter array (Geyer 1992 / Stan)."""
    x = np.asarray(x, dtype=np.float64)
    if x.ndim == 1:
        x = x[None, :]
    m, n = x.shape
    if n < 4:
        return float(m * n)
    acov = _autocovariance(x)  # (m, n)
    chain_var = acov[:, 0] * n / (n - 1.0)
    mean_var = np.mean(chain_var)
    var_plus = mean_var * (n - 1.0) / n
    if m > 1:
        var_plus += np.var(x.mean(axis=1), ddof=1)

    rho_hat = np.zeros(n)
    rho_hat[0] = 1.0
    # Geyer pairs: keep adding while the pair sums stay positive & monotone
    t = 1
    last_pair = None
    while t + 1 < n:
        pair = (
            1.0
            - (mean_var - np.mean(acov[:, t])) / var_plus
            + 1.0
            - (mean_var - np.mean(acov[:, t + 1])) / var_plus
        )
        if pair < 0:
            break
        if last_pair is not None:
            pair = min(pair, last_pair)
        last_pair = pair
        rho_hat[t] = 1.0 - (mean_var - np.mean(acov[:, t])) / var_plus
        rho_hat[t + 1] = 1.0 - (mean_var - np.mean(acov[:, t + 1])) / var_plus
        t += 2
    tau = 1.0 + 2.0 * np.sum(rho_hat[1:t])
    return float(m * n / max(tau, 1e-12))


def split_rhat(x: np.ndarray) -> float:
    """Split-Rhat of a (chains, draws) scalar-parameter array."""
    x = np.asarray(x, dtype=np.float64)
    if x.ndim == 1:
        x = x[None, :]
    m, n = x.shape
    half = n // 2
    if half < 2:
        return float("nan")
    splits = np.concatenate([x[:, :half], x[:, half : 2 * half]], axis=0)
    sm, sn = splits.shape
    chain_means = splits.mean(axis=1)
    chain_vars = splits.var(axis=1, ddof=1)
    w = chain_vars.mean()
    b = sn * chain_means.var(ddof=1)
    var_plus = (sn - 1.0) / sn * w + b / sn
    return float(np.sqrt(var_plus / max(w, 1e-300)))


def hdi(samples: np.ndarray, prob: float = 0.9) -> np.ndarray:
    """Highest-density interval of a 1-D sample array -> [low, high]."""
    x = np.sort(np.asarray(samples).ravel())
    n = len(x)
    span = max(int(np.floor(prob * n)), 1)
    widths = x[span:] - x[: n - span]
    i = int(np.argmin(widths)) if len(widths) else 0
    return np.array([x[i], x[min(i + span, n - 1)]])


def summary(
    samples_by_chain: Dict[str, np.ndarray], prob: float = 0.9
) -> Dict[str, Dict[str, float]]:
    """Per-site summary (flattening plated sites): mean/std/hdi/ess/rhat.

    Expects (chains, draws, *plate) arrays.
    """
    out: Dict[str, Dict[str, float]] = {}
    for name, arr in samples_by_chain.items():
        arr = np.asarray(arr)
        if arr.ndim < 2:
            arr = arr.reshape(1, -1)
        plate_shape = arr.shape[2:]
        for idx in np.ndindex(*plate_shape) if plate_shape else [()]:
            sub = arr[(slice(None), slice(None)) + idx]
            key = name + ("_" + "_".join(map(str, idx)) if idx else "")
            low, high = hdi(sub, prob)
            out[key] = {
                "mean": float(sub.mean()),
                "std": float(sub.std()),
                f"hdi_{prob:.0%}_low": float(low),
                f"hdi_{prob:.0%}_high": float(high),
                "n_eff": effective_sample_size(sub),
                "r_hat": split_rhat(sub),
            }
    return out


__all__ = ["effective_sample_size", "split_rhat", "hdi", "summary"]
