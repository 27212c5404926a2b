"""Native runtime library tests (C++ SPSC channel + binary feature cache)."""

import threading

import numpy as np

from snakeslam_tpu.utils import native


def test_native_library_builds():
    assert native.available(), "libsnakert.so failed to build"


def test_channel_roundtrip():
    ch = native.NativeChannel(capacity=2)
    assert ch.push({"a": 1})
    assert ch.push([1, 2, 3])
    out1 = ch.pop()
    out2 = ch.pop()
    assert out1 == {"a": 1}
    assert out2 == [1, 2, 3]
    assert ch.pop(timeout_ms=50) is None  # empty -> timeout


def test_channel_backpressure_and_threads():
    ch = native.NativeChannel(capacity=2)
    received = []

    def consumer():
        while True:
            item = ch.pop(timeout_ms=2000)
            if item is None or item == "STOP":
                return
            received.append(item)

    t = threading.Thread(target=consumer)
    t.start()
    for i in range(50):
        assert ch.push(i, timeout_ms=2000)
    ch.push("STOP", timeout_ms=2000)
    t.join(timeout=5.0)
    assert received == list(range(50))


def test_feature_cache_roundtrip(tmp_path, rng):
    n = 500
    uv = rng.uniform(0, 752, size=(n, 2))
    octave = rng.integers(0, 4, size=n).astype(np.int32)
    angle = rng.uniform(0, 360, size=n).astype(np.float32)
    desc = rng.integers(0, 256, size=(n, 32), dtype=np.uint8)
    path = tmp_path / "0.features"
    assert native.write_features(path, uv, octave, angle, desc)
    out = native.read_features(path)
    assert out is not None
    assert np.array_equal(out["uv"], uv)
    assert np.array_equal(out["octave"], octave)
    assert np.array_equal(out["angle"], angle)
    assert np.array_equal(out["descriptors"], desc)


def test_feature_cache_missing(tmp_path):
    assert native.read_features(tmp_path / "nope.features") is None
