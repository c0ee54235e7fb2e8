"""TensorBoard event-file writer (utils/tb.py): crc32c correctness,
TFRecord framing, protobuf scalar round-trip, and the reference
TensorboardWriter.write_epoch semantics (tensorboard.py:10-27)."""

from __future__ import annotations

import glob
import os
import struct

from mmtrack_tpu.utils.tb import (
    EventWriter,
    TensorboardWriter,
    _crc32c,
    _masked_crc,
    read_scalars,
)


def test_crc32c_known_vectors():
    # RFC 3720 / Castagnoli reference vectors
    assert _crc32c(b"123456789") == 0xE3069283
    assert _crc32c(b"") == 0x0
    assert _crc32c(b"\x00" * 32) == 0x8A9136AA


def test_scalar_round_trip(tmp_path):
    w = EventWriter(str(tmp_path / "run"))
    w.add_scalar("Loss/total", 1.5, step=1)
    w.add_scalar("Loss/total", 0.75, step=2)
    w.add_scalars([("a", 3.0), ("b", -4.25)], step=7)
    w.close()

    rows = read_scalars(w.path)
    assert (1, "Loss/total", 1.5) in rows
    assert (2, "Loss/total", 0.75) in rows
    assert (7, "a", 3.0) in rows and (7, "b", -4.25) in rows


def test_file_version_header_record(tmp_path):
    w = EventWriter(str(tmp_path / "run"))
    w.close()
    with open(w.path, "rb") as f:
        data = f.read()
    (length,) = struct.unpack("<Q", data[:8])
    payload = data[12:12 + length]
    assert b"brain.Event:2" in payload
    # framing CRCs verify (read_scalars raises on mismatch)
    assert read_scalars(w.path) == []


def test_corrupt_record_detected(tmp_path):
    w = EventWriter(str(tmp_path / "run"))
    w.add_scalar("x", 1.0, step=1)
    w.close()
    with open(w.path, "r+b") as f:
        f.seek(-6, os.SEEK_END)  # flip a payload byte of the last record
        b = f.read(1)
        f.seek(-6, os.SEEK_END)
        f.write(bytes([b[0] ^ 0xFF]))
    try:
        read_scalars(w.path)
    except ValueError as e:
        assert "crc" in str(e)
    else:
        raise AssertionError("corruption not detected")


class _Stat:
    def __init__(self, history, has_new_data=True):
        self.history = history
        self.has_new_data = has_new_data


def test_tensorboard_writer_write_epoch(tmp_path):
    tb = TensorboardWriter(str(tmp_path), ["train", "val"])
    stats = {
        "train": {"Loss/total": _Stat([2.0, 1.0]),
                  "stale": _Stat([9.0], has_new_data=False),
                  "fps": 123.0},
        "val": None,                      # skipped (reference :23-24)
        "unknown_loader": {"x": 1.0},     # no writer -> ignored
    }
    tb.write_epoch(stats, epoch=3)
    tb.write_epoch({"val": {"val/Loss": 0.5}}, epoch=3)
    tb.close()

    train_file = glob.glob(str(tmp_path / "train" / "events.out.tfevents.*"))[0]
    rows = read_scalars(train_file)
    assert (3, "Loss/total", 1.0) in rows      # history[-1]
    assert (3, "fps", 123.0) in rows           # plain float stat
    assert not any(tag == "stale" for _, tag, _ in rows)

    val_file = glob.glob(str(tmp_path / "val" / "events.out.tfevents.*"))[0]
    assert (3, "val/Loss", 0.5) in read_scalars(val_file)


def test_trainer_accepts_tb_writer(tmp_path):
    # plumbing only: Trainer(tb_writer=...) writes one scalar set per epoch
    import jax.numpy as jnp

    from mmtrack_tpu.train.trainer import Trainer

    class State:
        pass

    def step(state, batch, rng):
        return state, {"Loss/total": jnp.asarray(0.25)}

    tb = TensorboardWriter(str(tmp_path), ["train"])
    tr = Trainer(step, State(), loader=[{"search": [0, 1]}] * 2,
                 tb_writer=tb, print_interval=1000, log_fn=lambda *a: None)
    tr.train(max_epochs=2, load_latest=False, fail_safe=False)
    tb.close()
    f = glob.glob(str(tmp_path / "train" / "events.out.tfevents.*"))[0]
    rows = read_scalars(f)
    steps = sorted({s for s, t, _ in rows if t == "Loss/total"})
    assert steps == [1, 2]
