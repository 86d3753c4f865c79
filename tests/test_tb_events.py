"""The from-scratch TensorBoard event writer (utils/tb_events.py) must emit
files TensorBoard can actually load: TFRecord framing with valid masked
CRC32C, and protobuf wire-format Event/Summary payloads with the right
field numbers. Verified here with an independent minimal decoder (written
against the public event.proto/summary.proto specs, not against the
writer's code)."""

import glob
import struct

import numpy as np
import pytest

from fullsubnet_plus_tpu.utils.tb_events import EventWriter, _crc32c, _masked_crc


# -- independent decoder ----------------------------------------------------

def read_records(path):
    out = []
    with open(path, "rb") as f:
        while True:
            hdr = f.read(8)
            if not hdr:
                return out
            (length,) = struct.unpack("<Q", hdr)
            (len_crc,) = struct.unpack("<I", f.read(4))
            assert len_crc == _masked_crc(hdr), "length CRC mismatch"
            payload = f.read(length)
            (crc,) = struct.unpack("<I", f.read(4))
            assert crc == _masked_crc(payload), "payload CRC mismatch"
            out.append(payload)


def parse_fields(buf):
    """[(field, wire, value)] — value is int for varint, bytes for
    length-delimited, raw 4/8 bytes for fixed."""
    fields, i = [], 0
    while i < len(buf):
        key, i = _read_varint(buf, i)
        field, wire = key >> 3, key & 7
        if wire == 0:
            v, i = _read_varint(buf, i)
        elif wire == 1:
            v, i = buf[i : i + 8], i + 8
        elif wire == 2:
            n, i = _read_varint(buf, i)
            v, i = buf[i : i + n], i + n
        elif wire == 5:
            v, i = buf[i : i + 4], i + 4
        else:
            raise AssertionError(f"unexpected wire type {wire}")
        fields.append((field, wire, v))
    return fields


def _read_varint(buf, i):
    shift, out = 0, 0
    while True:
        b = buf[i]
        out |= (b & 0x7F) << shift
        i += 1
        if not b & 0x80:
            return out, i
        shift += 7


def summary_values(event_bytes):
    """tag -> {field: value} for each Summary.Value in an Event."""
    out = {}
    for field, _w, v in parse_fields(event_bytes):
        if field == 5:  # Event.summary
            for f2, _w2, val in parse_fields(v):
                assert f2 == 1  # Summary.value
                entry = {}
                for f3, _w3, x in parse_fields(val):
                    entry[f3] = x
                out[entry[1].decode()] = entry
    return out


# -- tests ------------------------------------------------------------------

def test_crc32c_known_vectors():
    # Public CRC-32C test vectors (RFC 3720 appendix / common suites).
    assert _crc32c(b"123456789") == 0xE3069283
    assert _crc32c(b"") == 0x0
    assert _crc32c(b"\x00" * 32) == 0x8A9136AA


def test_scalar_roundtrip(tmp_path):
    w = EventWriter(str(tmp_path))
    w.add_scalar("Loss/Train", 0.125, 7)
    w.add_scalar("Loss/Train", 0.0625, 8)
    w.close()
    (path,) = glob.glob(str(tmp_path / "events.out.tfevents.*"))
    records = read_records(path)
    # Record 0: file_version header.
    header = dict((f, v) for f, _w, v in parse_fields(records[0]))
    assert header[3] == b"brain.Event:2"
    vals = summary_values(records[1])
    (value,) = struct.unpack("<f", vals["Loss/Train"][2])
    assert value == 0.125
    steps = [dict((f, v) for f, _w, v in parse_fields(r)).get(2)
             for r in records[1:]]
    assert steps == [7, 8]


def test_audio_event_embeds_wav(tmp_path):
    w = EventWriter(str(tmp_path))
    snd = 0.5 * np.sin(2 * np.pi * 440 * np.arange(1600) / 16000)
    w.add_audio("Speech/utt0", snd, 3, sample_rate=16000)
    w.close()
    (path,) = glob.glob(str(tmp_path / "events.out.tfevents.*"))
    vals = summary_values(read_records(path)[1])
    audio = {f: x for f, _w, x in parse_fields(vals["Speech/utt0"][6])}
    (sr,) = struct.unpack("<f", audio[1])
    assert sr == 16000.0
    assert audio[2] == 1 and audio[3] == 1600
    wav = audio[4]
    assert wav[:4] == b"RIFF" and wav[8:12] == b"WAVE"
    pcm = np.frombuffer(wav[44:], "<i2").astype(np.float64) / 32767.0
    np.testing.assert_allclose(pcm, snd, atol=1 / 32000)
    assert audio[5] == b"audio/wav"


def test_figure_event_embeds_png(tmp_path):
    matplotlib = pytest.importorskip("matplotlib")
    matplotlib.use("Agg")
    import matplotlib.pyplot as plt

    fig, ax = plt.subplots(figsize=(2, 1))
    ax.plot([0, 1], [1, 0])
    w = EventWriter(str(tmp_path))
    w.add_figure("Spectrogram/utt0", fig, 2)
    w.close()
    plt.close(fig)
    (path,) = glob.glob(str(tmp_path / "events.out.tfevents.*"))
    vals = summary_values(read_records(path)[1])
    image = {f: x for f, _w, x in parse_fields(vals["Spectrogram/utt0"][4])}
    png = image[4]
    assert png[:8] == b"\x89PNG\r\n\x1a\n"
    wdt, h = struct.unpack(">II", png[16:24])  # IHDR: width, then height
    assert (image[1], image[2]) == (h, wdt) and h > 0 and wdt > 0


def test_np_magspec_matches_device_stft():
    """The TB spectrogram is computed host-side (_np_magspec) — dispatching
    dsp.stft from inside the validation loop compiled a fresh device
    program per utterance length and wedged the axon backend (every
    subsequent transfer failed UNIMPLEMENTED). The picture must still be
    the same picture: same shape, near-identical magnitudes."""
    from fullsubnet_plus_tpu.dsp.stft import stft
    from fullsubnet_plus_tpu.train.trainer import _np_magspec

    y = np.sin(2 * np.pi * 440 * np.arange(16000) / 16000).astype(np.float32)
    ours = _np_magspec(y)
    theirs = np.abs(np.asarray(stft(y[None])))[0]
    assert ours.shape == theirs.shape
    np.testing.assert_allclose(ours, theirs, atol=2e-3 * theirs.max())


def test_visualization_is_host_side_and_parseable(tmp_path, monkeypatch):
    """spec_audio_visualization must never enter jax (device dispatch) and
    must emit decodable audio + figure events."""
    import fullsubnet_plus_tpu.train.trainer as trainer_mod
    from fullsubnet_plus_tpu.models import FULLSUBNET_PLUS

    tr = trainer_mod.Trainer(
        FULLSUBNET_PLUS,
        FULLSUBNET_PLUS.make_config({"num_freqs": 257}),
        save_dir=str(tmp_path),
        train_loader=None,
        valid_dataset=None,
        use_tensorboard=True,
    )

    def _no_device_calls(*a, **k):
        raise AssertionError("visualization dispatched a device program")

    monkeypatch.setattr(trainer_mod.jax, "jit", _no_device_calls)
    monkeypatch.setattr(trainer_mod.jax, "device_put", _no_device_calls)
    y = np.random.default_rng(0).standard_normal(16000).astype(np.float32) * 0.1
    tr.spec_audio_visualization(y, y, y, "utt0", 1, mark="No_reverb")
    tr.writer.close()
    (path,) = glob.glob(str(tmp_path / "logs" / "events.out.tfevents.*"))
    tags = set()
    for rec in read_records(path)[1:]:
        tags |= set(summary_values(rec))
    assert "No_reverb_Speech/utt0_Noisy" in tags
    assert "No_reverb_Spectrogram/utt0" in tags


def test_trainer_writes_events(tmp_path):
    """The trainer's writer hookup produces a parseable event file."""
    from fullsubnet_plus_tpu.models import FULLSUBNET_PLUS
    from fullsubnet_plus_tpu.train.trainer import Trainer

    tr = Trainer(
        FULLSUBNET_PLUS,
        FULLSUBNET_PLUS.make_config({"num_freqs": 257}),
        save_dir=str(tmp_path),
        train_loader=None,
        valid_dataset=None,
        use_tensorboard=True,
    )
    tr.writer.add_scalar("Loss/Train", 1.0, 1)
    tr.writer.close()
    (path,) = glob.glob(str(tmp_path / "logs" / "events.out.tfevents.*"))
    assert "Loss/Train" in summary_values(read_records(path)[1])
