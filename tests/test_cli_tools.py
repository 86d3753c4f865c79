"""Coverage for the small CLI tools and support utils: prepare_data
(gen-lst / resample-dir / collect-lst), synthesize (offline mixer),
analyse (metric diff/hist), logger, profiling meters, dns_mos arg surface.
"""

import json
import os

import numpy as np
import pytest

from fullsubnet_plus_tpu.data.wav import read_wav, write_wav

SR = 16000


@pytest.fixture
def corpus(tmp_path, rng):
    t = np.arange(4 * SR) / SR
    clean_dir = tmp_path / "clean"
    clean_dir.mkdir()
    for i in range(3):
        write_wav(
            str(clean_dir / f"c{i}.wav"),
            (0.3 * np.sin(2 * np.pi * (200 + 50 * i) * t)).astype(np.float32),
            SR,
        )
    # one too-short file and one mostly-silent file for collect-lst gates
    # (the VAD loudness-retargets first, so only *relative* silence fails it)
    write_wav(str(clean_dir / "short.wav"), np.zeros(SR // 2, np.float32), SR)
    quiet = np.zeros(4 * SR, np.float32)
    quiet[: SR // 5] = 0.3 * np.sin(2 * np.pi * 300 * t[: SR // 5]).astype(np.float32)
    write_wav(str(clean_dir / "quiet.wav"), quiet, SR)
    noise_dir = tmp_path / "noise"
    noise_dir.mkdir()
    for i in range(2):
        write_wav(
            str(noise_dir / f"n{i}.wav"),
            (0.1 * rng.standard_normal(4 * SR)).astype(np.float32),
            SR,
        )
    return tmp_path


def test_prepare_data_gen_lst_and_collect(corpus):
    from fullsubnet_plus_tpu.cli.prepare_data import main

    out = corpus / "all.txt"
    main(["gen-lst", str(corpus / "clean"), str(out)])
    paths = out.read_text().splitlines()
    assert len(paths) == 5 and all(p.endswith(".wav") for p in paths)

    kept = corpus / "kept.txt"
    main([
        "collect-lst", str(corpus / "clean"), str(kept),
        "--min-seconds", "1.0", "--activity-threshold", "0.5", "--workers", "2",
    ])
    kept_paths = kept.read_text().splitlines()
    # the 0.5 s file fails the duration gate, the near-silent one the VAD gate
    assert len(kept_paths) == 3
    assert not any("short" in p or "quiet" in p for p in kept_paths)


def test_prepare_data_resample_dir(corpus):
    from fullsubnet_plus_tpu.cli.prepare_data import main

    dst = corpus / "resampled"
    main(["resample-dir", str(corpus / "noise"), str(dst), "--sr", "8000",
          "--workers", "2"])
    y = read_wav(str(dst / "n0.wav"))
    assert y.shape == (4 * 8000,)  # 4 s at 8 kHz


def test_synthesize_cli(corpus):
    from fullsubnet_plus_tpu.cli.synthesize import main

    clean_lst = corpus / "clean.txt"
    noise_lst = corpus / "noise.txt"
    clean_lst.write_text(
        "\n".join(str(corpus / "clean" / f"c{i}.wav") for i in range(3)) + "\n"
    )
    noise_lst.write_text(
        "\n".join(str(corpus / "noise" / f"n{i}.wav") for i in range(2)) + "\n"
    )
    out = corpus / "premixed"
    main([
        "--clean-list", str(clean_lst), "--noise-list", str(noise_lst),
        "--output-dir", str(out), "--num-files", "4", "--seconds", "2",
        "--snr-range", "0", "5",
    ])
    noisy_files = sorted(os.listdir(out / "noisy"))
    clean_files = sorted(os.listdir(out / "clean"))
    assert len(noisy_files) == len(clean_files) == 4
    noisy = read_wav(str(out / "noisy" / noisy_files[0]))
    clean = read_wav(str(out / "clean" / clean_files[0]))
    assert noisy.shape == clean.shape == (2 * SR,)
    assert float(np.abs(noisy - clean).max()) > 1e-4  # noise actually added

    # determinism: same seed -> identical files
    out2 = corpus / "premixed2"
    main([
        "--clean-list", str(clean_lst), "--noise-list", str(noise_lst),
        "--output-dir", str(out2), "--num-files", "1", "--seconds", "2",
        "--snr-range", "0", "5",
    ])
    again = read_wav(str(out2 / "noisy" / "noisy_fileid_0.wav"))
    np.testing.assert_array_equal(noisy, again)


def test_analyse_cli(tmp_path, capsys):
    from fullsubnet_plus_tpu.cli.analyse import main

    a, b = tmp_path / "a.txt", tmp_path / "b.txt"
    a.write_text("1.0\tf1.wav\n2.0\tf2.wav\n3.0\tf3.wav\n")
    b.write_text("1.5\tf1.wav\n1.0\tf2.wav\n4.0\tf3.wav\n")
    hist = tmp_path / "delta.png"
    main(["compare", str(a), str(b), "--hist", str(hist), "--top", "2"])
    captured = capsys.readouterr().out
    assert "mean delta" in captured and "improved: 2" in captured
    assert hist.exists() and hist.stat().st_size > 0

    out = tmp_path / "hist.png"
    main(["hist", str(a), "--out", str(out)])
    assert out.exists()


def test_logger_file_and_slack_noop(tmp_path, capsys):
    from fullsubnet_plus_tpu.utils import logger

    path = tmp_path / "logs" / "train.log"
    logger.init(str(path), run_name="unit")
    logger.log("hello", 42)
    logger.init(None)  # detach so later tests don't append here
    text = path.read_text()
    assert "hello 42" in text
    assert "hello 42" in capsys.readouterr().out


def test_rtf_meter():
    import time

    from fullsubnet_plus_tpu.utils.profiling import RtfMeter, device_trace

    meter = RtfMeter(sr=16000)
    with meter.measure(16000):
        time.sleep(0.01)
    assert meter.audio == 1.0
    assert meter.wall > 0
    assert meter.rtf == pytest.approx(meter.wall, rel=1e-6)
    assert meter.throughput == pytest.approx(1.0 / meter.wall, rel=1e-6)
    with device_trace(None):  # no-op path
        pass


def test_dns_mos_requires_key():
    """The client keeps the reference's surface but fails cleanly without
    egress/key (tools/dns_mos.py:107-117)."""
    from fullsubnet_plus_tpu.cli import dns_mos

    with pytest.raises(SystemExit):
        dns_mos.main(["--help"])  # argparse help exits 0


def test_bench_timed_rounds_discipline():
    """bench._timed_rounds: N independently timed regions, every iteration's
    tap forced inside its round's clock (the r4 noise-proof headline
    methodology — min over rounds, spread reported)."""
    import types

    import bench

    calls, forced = [], []

    class Tap:
        def __float__(self):
            forced.append(1)
            return 0.0

    def run(step):  # queue-ahead: taps are forced after the dispatch loop
        calls.append(step)
        return Tap()

    args = types.SimpleNamespace(rounds=3, iters=4, warmup=2,
                                 sync_every_iter=False)
    elapsed = bench._timed_rounds(run, args)
    assert len(elapsed) == 3 and all(e >= 0 for e in elapsed)
    # 3 rounds x 4 iters, step indices continue across rounds from warmup
    assert calls == list(range(2, 14))
    assert len(forced) == 12  # every tap's completion forced
