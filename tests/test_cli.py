"""CLI surface: encode / decode / probe round-trips through main().

(The reference ships no CLI at all — its only entry is the Aurora
plugin registration, decoder.js:29-31.)
"""
import json
import struct

import numpy as np
import pytest

from aacjax.cli import main

SR = 44100


def write_wav(path, pcm, rate=SR):
    i16 = np.clip(np.round(pcm), -32768, 32767).astype("<i2")
    data = i16.tobytes()
    ch = pcm.shape[1]
    with open(path, "wb") as f:
        f.write(b"RIFF" + struct.pack("<I", 36 + len(data)) + b"WAVE")
        f.write(b"fmt " + struct.pack("<IHHIIHH", 16, 1, ch, rate,
                                      rate * ch * 2, ch * 2, 16))
        f.write(b"data" + struct.pack("<I", len(data)) + data)


@pytest.fixture()
def tone_wav(tmp_path):
    t = np.arange(SR) / SR
    x = 9000 * np.sin(2 * np.pi * 523 * t)
    p = tmp_path / "in.wav"
    write_wav(str(p), np.stack([x, 0.8 * x], axis=1))
    return p


def test_encode_decode_adts_roundtrip(tone_wav, tmp_path, capsys):
    aac = tmp_path / "out.aac"
    wav = tmp_path / "out.wav"
    assert main(["encode", str(tone_wav), str(aac),
                 "--bitrate", "128000"]) == 0
    info = json.loads(capsys.readouterr().out)
    assert info["container"] == "adts"
    assert abs(info["kbps"] - 128.0) < 20
    assert main(["probe", str(aac)]) == 0
    probe = json.loads(capsys.readouterr().out)
    assert probe["adts"] and probe["sample_rate"] == SR
    assert main(["decode", str(aac), str(wav)]) == 0
    out = json.loads(capsys.readouterr().out)
    assert out["format"] == "wav/pcm_s16le"
    assert out["samples"] >= SR


def test_encode_m4a_gapless(tone_wav, tmp_path, capsys):
    m4a = tmp_path / "out.m4a"
    assert main(["encode", str(tone_wav), str(m4a)]) == 0
    info = json.loads(capsys.readouterr().out)
    assert info["container"] == "m4a"
    wav = tmp_path / "out.wav"
    assert main(["decode", str(m4a), str(wav)]) == 0
    out = json.loads(capsys.readouterr().out)
    # gapless metadata trims the encoder delay: exact sample count back
    assert out["samples"] == SR


def test_encode_tool_switches(tone_wav, tmp_path, capsys):
    aac = tmp_path / "plain.aac"
    assert main(["encode", str(tone_wav), str(aac), "--no-tns",
                 "--no-pns", "--no-is"]) == 0
    capsys.readouterr()
    from aacjax import decode_adts
    decode_adts(open(aac, "rb").read(), on_error="raise")


def test_decode_rejects_garbage(tmp_path):
    bad = tmp_path / "bad.bin"
    bad.write_bytes(b"definitely not audio" * 10)
    with pytest.raises(Exception):
        main(["decode", str(bad), str(tmp_path / "x.pcm")])


def test_encode_he_cli(tone_wav, tmp_path, capsys):
    aac = tmp_path / "he.aac"
    assert main(["encode", str(tone_wav), str(aac), "--he",
                 "--bitrate", "40000"]) == 0
    info = json.loads(capsys.readouterr().out)
    assert info["profile"] == "HE-AAC"
    from aacjax import decode_adts
    out, rate = decode_adts(aac.read_bytes())
    assert rate == SR and out.shape[1] == 2  # 2x-rate decode of 22050 core


def test_transcode_example_chain(tone_wav, tmp_path):
    """examples/transcode.py drives the full loop: wav -> LC adts ->
    HE m4a -> ELD loas -> wav."""
    import subprocess
    ex = "examples/transcode.py"
    steps = [
        (str(tone_wav), str(tmp_path / "a.aac"), []),
        (str(tmp_path / "a.aac"), str(tmp_path / "b.m4a"),
         ["--profile", "he", "--bitrate", "48000"]),
        (str(tmp_path / "b.m4a"), str(tmp_path / "c.loas"),
         ["--profile", "eld", "--bitrate", "64000"]),
        (str(tmp_path / "c.loas"), str(tmp_path / "d.wav"), []),
    ]
    import sys as _sys
    for src, dst, extra in steps:
        r = subprocess.run([_sys.executable, ex, src, dst] + extra,
                           capture_output=True, text=True, cwd="/root/repo")
        assert r.returncode == 0, (src, dst, r.stderr[-400:])
    assert (tmp_path / "d.wav").stat().st_size > 40000


def test_player_and_serving_examples(tone_wav, tmp_path):
    """The Aurora-style player and the batch-serving examples stay
    runnable end-to-end."""
    import subprocess
    import sys as _sys
    m4a = tmp_path / "p.m4a"
    r0 = subprocess.run([_sys.executable, "-m", "aacjax.cli", "encode",
                         str(tone_wav), str(m4a), "--bitrate", "96000"],
                        capture_output=True, text=True, cwd="/root/repo")
    assert r0.returncode == 0, r0.stderr[-300:]
    r1 = subprocess.run([_sys.executable, "examples/player.py", str(m4a),
                         str(tmp_path / "p.wav"), "--start", "0.2",
                         "--duration", "0.4"],
                        capture_output=True, text=True, cwd="/root/repo")
    assert r1.returncode == 0, r1.stderr[-300:]
    assert "played" in r1.stdout
    r2 = subprocess.run([_sys.executable, "examples/serving.py", "--demo"],
                        capture_output=True, text=True, cwd="/root/repo")
    assert r2.returncode == 0, r2.stderr[-300:]
    assert "failed streams: []" in r2.stderr or "failed streams: []" in r2.stdout


def test_serving_async_example():
    """The asyncio server multiplexes live clients onto one
    BatchDecoder with mid-pipeline slot recycling; each client's PCM is
    bit-exact vs a solo decode (the example's selftest asserts it)."""
    import subprocess
    import sys as _sys
    r = subprocess.run([_sys.executable, "examples/serving_async.py",
                        "--selftest"],
                       capture_output=True, text=True, cwd="/root/repo",
                       timeout=300)
    assert r.returncode == 0, (r.stderr[-500:], r.stdout[-200:])
    assert "selftest OK" in r.stdout
