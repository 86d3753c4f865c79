"""Metric registry (reference audio_zen/metrics.py:56-134).

SI-SDR and STOI are native numpy implementations; WB/NB-PESQ dispatch to the
`pesq`/`pypesq` wheels when present and raise a clear error otherwise (they
are not in this image — ITU P.862 is a licensed codebase the reference also
only consumes as a wheel). SDR (mir_eval) and MOSNET (speechmetrics) are
gated the same way.
"""

from __future__ import annotations

import numpy as np

from fullsubnet_plus_tpu.data.wav import resample
from fullsubnet_plus_tpu.eval.stoi import stoi as _stoi_impl


def si_sdr(reference: np.ndarray, estimation: np.ndarray, sr: int = 16000) -> float:
    """Scale-Invariant Signal-to-Distortion Ratio (metrics.py:61-85)."""
    reference = np.asarray(reference, np.float64)
    estimation = np.asarray(estimation, np.float64)
    optimal_scaling = np.sum(reference * estimation) / (
        np.sum(reference**2) + 1e-14
    )
    projection = optimal_scaling * reference
    noise = estimation - projection
    ratio = np.sum(projection**2) / (np.sum(noise**2) + 1e-14)
    return float(10 * np.log10(ratio + 1e-14))


def stoi(clean: np.ndarray, enhanced: np.ndarray, sr: int = 16000) -> float:
    return _stoi_impl(clean, enhanced, sr=sr)


def wb_pesq(clean: np.ndarray, enhanced: np.ndarray, sr: int = 16000) -> float:
    """Wide-band PESQ (ITU-T P.862.2), via the `pesq` wheel (metrics.py:92-100)."""
    try:
        from pesq import pesq as _pesq
    except ImportError as e:
        raise RuntimeError(
            "WB_PESQ needs the `pesq` package (ITU-T P.862 implementation), "
            "which is not installed in this environment."
        ) from e
    return float(_pesq(sr, clean, enhanced, "wb"))


def wb_pesq_est(clean: np.ndarray, enhanced: np.ndarray, sr: int = 16000) -> float:
    """From-scratch WB-PESQ-style MOS-LQO estimator (eval/pesq_estimator.py):
    P.862.2 pipeline structure, NOT ITU-conformant — always available, used
    for checkpoint ranking when the licensed wheel is absent."""
    from fullsubnet_plus_tpu.eval.pesq_estimator import wb_pesq_estimator

    return wb_pesq_estimator(clean, enhanced, sr=sr)


def nb_pesq_est(clean: np.ndarray, enhanced: np.ndarray, sr: int = 16000) -> float:
    """From-scratch NB-PESQ-style MOS-LQO estimator (eval/pesq_estimator.py):
    P.862/P.862.1 pipeline structure at 8 kHz, NOT ITU-conformant — always
    available, the in-image sibling of the reference's NB_PESQ."""
    from fullsubnet_plus_tpu.eval.pesq_estimator import nb_pesq_estimator

    return nb_pesq_estimator(clean, enhanced, sr=sr)


def nb_pesq(clean: np.ndarray, enhanced: np.ndarray, sr: int = 16000) -> float:
    """Narrow-band PESQ at 8 kHz (metrics.py:103-111)."""
    try:
        from pypesq import pesq as _pesq
    except ImportError:
        try:
            from pesq import pesq as _pesq_pkg

            clean8 = resample(clean.astype(np.float32), sr, 8000)
            enhanced8 = resample(enhanced.astype(np.float32), sr, 8000)
            return float(_pesq_pkg(8000, clean8, enhanced8, "nb"))
        except ImportError as e:
            raise RuntimeError(
                "NB_PESQ needs `pypesq` or `pesq`, neither is installed."
            ) from e
    clean8 = resample(clean.astype(np.float32), sr, 8000)
    enhanced8 = resample(enhanced.astype(np.float32), sr, 8000)
    return float(_pesq(clean8, enhanced8, 8000))


def sdr(reference: np.ndarray, estimation: np.ndarray, sr: int = 16000) -> float:
    """BSS-eval SDR via mir_eval when available (metrics.py:56-58)."""
    try:
        from mir_eval.separation import bss_eval_sources
    except ImportError as e:
        raise RuntimeError("SDR needs `mir_eval`, which is not installed.") from e
    sdr_val, _, _, _ = bss_eval_sources(reference[None, :], estimation[None, :])
    return float(sdr_val[0])


_MOSNET_MODEL = []


def mosnet(reference: np.ndarray, estimation: np.ndarray, sr: int = 16000) -> float:
    """Lazy MOSNet via `speechmetrics` when available (metrics.py:113-125)."""
    try:
        import speechmetrics
    except ImportError as e:
        raise RuntimeError(
            "MOSNET needs `speechmetrics`, which is not installed."
        ) from e
    if not _MOSNET_MODEL:
        _MOSNET_MODEL.append(speechmetrics.load("mosnet", window=None))
    result = _MOSNET_MODEL[0](estimation, rate=sr)
    return float(np.mean(result["mosnet"]))


REGISTERED_METRICS = {
    "SI_SDR": si_sdr,
    "STOI": stoi,
    "WB_PESQ": wb_pesq,
    "WB_PESQ_EST": wb_pesq_est,
    "NB_PESQ": nb_pesq,
    "NB_PESQ_EST": nb_pesq_est,
    "SDR": sdr,
    "MOSNET": mosnet,
}


def metric_available(name: str) -> bool:
    """True if the metric's backing implementation can run here."""
    if name in ("SI_SDR", "STOI", "WB_PESQ_EST", "NB_PESQ_EST"):
        return True
    if name in ("WB_PESQ", "NB_PESQ"):
        try:
            import pesq  # noqa: F401

            return True
        except ImportError:
            try:
                import pypesq  # noqa: F401

                return name == "NB_PESQ"
            except ImportError:
                return False
    if name == "SDR":
        try:
            import mir_eval  # noqa: F401

            return True
        except ImportError:
            return False
    if name == "MOSNET":
        try:
            import speechmetrics  # noqa: F401

            return True
        except ImportError:
            return False
    return False


def compute_metric(name: str, clean: np.ndarray, enhanced: np.ndarray,
                   sr: int = 16000) -> float:
    if name not in REGISTERED_METRICS:
        raise KeyError(f"Unknown metric {name!r}; known: {sorted(REGISTERED_METRICS)}")
    return REGISTERED_METRICS[name](clean, enhanced, sr=sr)


def transform_pesq_range(pesq_score: float) -> float:
    """[-0.5, 4.5] -> [0, 1] (reference acoustics/utils.py:4-8)."""
    return (pesq_score + 0.5) / 5.0


def validation_score(metric_means: dict) -> float:
    """Best-model gate: mean of STOI and range-normalized WB-PESQ
    (base_trainer.py:296-302). Falls back to the from-scratch WB_PESQ_EST
    estimator in the same formula when the licensed PESQ wheel is absent,
    then to STOI alone, then SI_SDR/20."""
    if "WB_PESQ" in metric_means and "STOI" in metric_means:
        return (metric_means["STOI"] + transform_pesq_range(metric_means["WB_PESQ"])) / 2
    if "WB_PESQ_EST" in metric_means and "STOI" in metric_means:
        return (
            metric_means["STOI"] + transform_pesq_range(metric_means["WB_PESQ_EST"])
        ) / 2
    if "STOI" in metric_means:
        return metric_means["STOI"]
    if "SI_SDR" in metric_means:
        return metric_means["SI_SDR"] / 20.0
    raise ValueError(f"No score-eligible metrics in {sorted(metric_means)}")
