"""CLI surface tests: reference flag spelling, output naming, headless runs."""

import os

import numpy as np
import pytest

from pvot.cli.main import generate_output_path, main, parse_args


def test_parse_reference_flags():
    args = parse_args(["data/car.mp4", "--shared", "--record", "--first"])
    assert args.mode == "shared" and args.record and args.first
    args = parse_args(["clip.avi", "--batch=8"])
    assert args.mode == "batch" and args.batch_size == 8
    args = parse_args([])
    # Reference defaults: data/car.mp4, mode "cuda" (main.cpp:58-59).
    assert args.video == "data/car.mp4" and args.mode == "cuda"


def test_output_path_generation(tmp_path, monkeypatch):
    """generate_output_path parity (main.cpp:28-47)."""
    monkeypatch.chdir(tmp_path)
    assert generate_output_path("data/car.mp4", "shared", 0) == "output/car_shared.mp4"
    assert generate_output_path("a/b/clip.avi", "batch", 8) == "output/clip_batch_8.avi"
    assert generate_output_path("noext", "cuda", 0) == "output/noext_cuda.mp4"
    assert os.path.isdir("output")


def test_headless_requires_roi(tmp_path, monkeypatch, capsys):
    monkeypatch.chdir(tmp_path)
    monkeypatch.delenv("DISPLAY", raising=False)
    with pytest.raises(SystemExit) as e:
        main(["--synthetic", "160x120x6", "--first"])
    assert e.value.code == -1
    assert "DISPLAY not set" in capsys.readouterr().err


def test_headless_synthetic_track(tmp_path, monkeypatch, capsys):
    monkeypatch.chdir(tmp_path)
    monkeypatch.delenv("DISPLAY", raising=False)
    rc = main([
        "--synthetic", "320x240x12", "--first", "--roi", "144,104,32,32",
        "--chunk-size", "4",
    ])
    assert rc == 0
    outp = capsys.readouterr().out
    assert "Tracking mode: cuda" in outp
    assert "Interactive tracking summary: frames=12," in outp


def test_headless_record(tmp_path, monkeypatch, capsys):
    monkeypatch.chdir(tmp_path)
    monkeypatch.delenv("DISPLAY", raising=False)
    rc = main([
        "--synthetic", "320x240x10", "--first", "--roi", "144,104,32,32",
        "--record", "--output", str(tmp_path / "out.avi"), "--chunk-size", "4",
    ])
    assert rc == 0
    out = capsys.readouterr().out
    assert "Recorded tracking summary: frames=10," in out
    from pvot.io.video import VideoReader

    with VideoReader(str(tmp_path / "out.avi")) as r:
        decoded = list(r)
    assert len(decoded) == 10


def test_batch_mode_cli(tmp_path, monkeypatch, capsys):
    monkeypatch.chdir(tmp_path)
    monkeypatch.delenv("DISPLAY", raising=False)
    rc = main([
        "--synthetic", "320x240x12", "--first", "--roi", "144,104,32,32",
        "--batch=3",
    ])
    assert rc == 0
    assert "Tracking mode: batch (batch size: 3)" in capsys.readouterr().out


def test_checkpoint_and_resume(tmp_path, monkeypatch, capsys):
    """CLI checkpoint/resume: split run == single run trajectory-wise."""
    monkeypatch.chdir(tmp_path)
    monkeypatch.delenv("DISPLAY", raising=False)
    ckpt = str(tmp_path / "state.npz")
    rc = main([
        "--synthetic", "320x240x12", "--first", "--roi", "144,104,32,32",
        "--chunk-size", "4", "--checkpoint-out", ckpt,
    ])
    assert rc == 0
    assert "Checkpoint saved" in capsys.readouterr().out
    rc = main([
        "--synthetic", "320x240x12", "--first", "--resume", ckpt,
        "--chunk-size", "4",
    ])
    assert rc == 0
    out = capsys.readouterr().out
    assert "Interactive tracking summary: frames=13," in out


def test_malformed_inputs_give_clean_errors(tmp_path, monkeypatch, capsys):
    monkeypatch.chdir(tmp_path)
    monkeypatch.delenv("DISPLAY", raising=False)
    with pytest.raises(SystemExit) as e:
        main(["--synthetic", "720p", "--first", "--roi", "1,1,8,8"])
    assert e.value.code == 2
    assert "expected WxHxF" in capsys.readouterr().err
    with pytest.raises(SystemExit) as e:
        main(["--synthetic", "160x120x4", "--first", "--roi", "1,2,3"])
    assert e.value.code == 2
    assert "expected X,Y,W,H" in capsys.readouterr().err
    with pytest.raises(SystemExit) as e:
        main(["--synthetic", "160x120x4", "--first", "--roi", "150,100,32,32"])
    assert e.value.code == 2
    assert "outside" in capsys.readouterr().err
    with pytest.raises(SystemExit) as e:
        main(["--synthetic", "160x120x4", "--first", "--roi", "10,10,0,5"])
    assert e.value.code == -1
