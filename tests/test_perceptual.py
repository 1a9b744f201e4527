"""Perceptual (average-hash) image dedup — operators/multimodal.py
perceptual_hashes / perceptual_near_pairs, over the REAL Netpbm
decoder. No DuckDB oracle (SQL cannot decode images); correctness is
pinned against a pure-Python reference and constructed fixtures."""

from __future__ import annotations

import random

from bike_data_flow_spark.operators.multimodal import (
    AHASH_MAX_HAMMING,
    _ahash64,
    perceptual_hashes,
    perceptual_near_pairs,
)


def _ppm(w: int, h: int, pixels: list[tuple[int, int, int]]) -> bytes:
    assert len(pixels) == w * h
    body = bytes(v for px in pixels for v in px)
    return b"P6\n# test\n%d %d\n255\n" % (w, h) + body


def _random_image(rng: random.Random, w=16, h=16) -> list[tuple[int, int, int]]:
    return [
        (rng.randrange(256), rng.randrange(256), rng.randrange(256))
        for _ in range(w * h)
    ]


def test_ahash_deterministic_and_structural():
    rng = random.Random(3)
    px = _random_image(rng)
    blob = _ppm(16, 16, px)
    h1, h2 = _ahash64(blob), _ahash64(blob)
    assert h1 == h2 and h1 is not None
    # constant image: every cell equals the mean -> all bits set
    flat = _ppm(4, 4, [(100, 100, 100)] * 16)
    assert _ahash64(flat) == -1  # 64 ones, two's complement
    # non-image payloads hash to None
    assert _ahash64(b"\x00\x01\x02") is None
    assert _ahash64(b"RIFF....WAVE") is None


def test_ahash_robust_to_small_perturbation_distinct_for_different():
    rng = random.Random(7)
    base = _random_image(rng)
    # perturb ONE pixel slightly: cell means barely move, hash ~equal
    near = list(base)
    r, g, b = near[40]
    near[40] = (min(255, r + 4), g, b)
    different = _random_image(random.Random(99))

    h_base = _ahash64(_ppm(16, 16, base))
    h_near = _ahash64(_ppm(16, 16, near))
    h_diff = _ahash64(_ppm(16, 16, different))
    assert bin(h_base ^ h_near).count("1") <= 1
    assert bin(h_base ^ h_diff).count("1") > AHASH_MAX_HAMMING


def test_perceptual_pipeline_finds_near_dups_only(spark):
    rng = random.Random(11)
    base = _random_image(rng)
    near = list(base)
    r, g, b = near[5]
    near[5] = (min(255, r + 3), g, b)
    rows = [
        ("a", _ppm(16, 16, base)),
        ("a_copy", _ppm(16, 16, base)),
        ("a_near", _ppm(16, 16, near)),
        ("other", _ppm(16, 16, _random_image(random.Random(42)))),
        ("junk", b"not an image"),
    ]
    df = spark.createDataFrame(rows, "media_id string, content binary")
    hashes = perceptual_hashes(df)
    got = {r["media_id"]: r["ahash"] for r in hashes.collect()}
    assert "junk" not in got  # undecodable dropped
    assert got["a"] == got["a_copy"]

    pairs = {
        (r["id_a"], r["id_b"]): r["hamming"]
        for r in perceptual_near_pairs(hashes).collect()
    }
    assert ("a", "a_copy") in pairs and pairs[("a", "a_copy")] == 0
    assert ("a", "a_near") in pairs
    assert not any("other" in p for p in pairs)


def test_perceptual_near_pairs_rejects_undialed_radius(spark):
    import pytest

    df = spark.createDataFrame([("x", 0)], "media_id string, ahash long")
    with pytest.raises(ValueError, match="pigeonhole"):
        perceptual_near_pairs(df, max_hamming=8)


def test_ahash_pools_non_divisible_sizes():
    rng = random.Random(5)
    px = [(rng.randrange(256),) * 3 for _ in range(13 * 9)]
    h = _ahash64(_ppm(13, 9, px))
    assert h is not None
    # tiny image (smaller than the grid) still hashes
    assert _ahash64(_ppm(2, 2, [(0, 0, 0), (255, 255, 255)] * 2)) is not None


def _wav(samples: list[int], rate=8000, n_ch=1) -> bytes:
    import struct

    data = b"".join(struct.pack("<h", s) for s in samples)
    fmt = struct.pack("<HHIIHH", 1, n_ch, rate, rate * 2 * n_ch, 2 * n_ch, 16)
    chunks = b"WAVE" + b"fmt " + struct.pack("<I", len(fmt)) + fmt
    chunks += b"data" + struct.pack("<I", len(data)) + data
    return b"RIFF" + struct.pack("<I", len(chunks)) + chunks


def test_audio_fingerprint_matches_scaled_copy_not_different():
    from bike_data_flow_spark.operators.multimodal import (
        _audio_fingerprint64,
    )

    rng = random.Random(13)
    base = [rng.randrange(-8000, 8000) for _ in range(2048)]
    half_volume = [s // 2 for s in base]
    different = [rng.randrange(-8000, 8000) for _ in range(2048)]

    h_base = _audio_fingerprint64(_wav(base))
    h_half = _audio_fingerprint64(_wav(half_volume))
    h_diff = _audio_fingerprint64(_wav(different))
    assert h_base is not None
    # energy contour thresholds on its own mean: volume-invariant
    assert bin(h_base ^ h_half).count("1") <= 2
    assert bin(h_base ^ h_diff).count("1") > AHASH_MAX_HAMMING
    # non-audio payloads
    assert _audio_fingerprint64(b"P6 not audio") is None


def test_audio_dedup_reuses_near_pairs(spark):
    from bike_data_flow_spark.operators.multimodal import audio_fingerprints

    rng = random.Random(17)
    base = [rng.randrange(-8000, 8000) for _ in range(2048)]
    rows = [
        ("clip", _wav(base)),
        ("clip_louder", _wav([min(32767, s * 2) for s in base])),
        ("other", _wav([rng.randrange(-8000, 8000) for _ in range(2048)])),
        ("noise", b"not audio at all"),
    ]
    df = spark.createDataFrame(rows, "media_id string, content binary")
    hashes = audio_fingerprints(df)
    ids = {r["media_id"] for r in hashes.collect()}
    assert ids == {"clip", "clip_louder", "other"}
    pairs = {
        (r["id_a"], r["id_b"]) for r in perceptual_near_pairs(hashes).collect()
    }
    assert ("clip", "clip_louder") in pairs
    assert not any("other" in p for p in pairs)


def test_wav_multiple_data_chunks_consistent_decode_and_fingerprint():
    """Decoder and fingerprint must agree on WHICH bytes are the audio
    (last data chunk wins in both); a zero-length leading data chunk
    must not make the fingerprint drop a clip the decoder accepts."""
    import struct

    from bike_data_flow_spark.operators.multimodal import (
        _audio_fingerprint64,
        _decode_wav,
    )

    rng = random.Random(23)
    samples = [rng.randrange(-8000, 8000) for _ in range(1024)]
    data = b"".join(struct.pack("<h", s) for s in samples)
    fmt = struct.pack("<HHIIHH", 1, 1, 8000, 16000, 2, 16)
    chunks = b"WAVE" + b"fmt " + struct.pack("<I", len(fmt)) + fmt
    chunks += b"data" + struct.pack("<I", 0)  # empty decoy first
    chunks += b"data" + struct.pack("<I", len(data)) + data
    blob = b"RIFF" + struct.pack("<I", len(chunks)) + chunks

    rate, n_ch, n_frames, rms = _decode_wav(blob)
    assert (rate, n_ch, n_frames) == (8000, 1, 1024)
    h = _audio_fingerprint64(blob)
    assert h is not None
    assert h == _audio_fingerprint64(_wav(samples))


def test_kcenter_empty_and_k_exceeding_corpus(spark):
    from bike_data_flow_spark.operators.similarity import kcenter_greedy

    empty = spark.createDataFrame([], "vec_id long, embedding array<double>")
    out = kcenter_greedy(empty, k=3)
    assert out.columns == ["sel_rank", "vec_id", "d"]
    assert out.count() == 0

    three = spark.createDataFrame(
        [(1, [0.0, 0.0]), (2, [1.0, 0.0]), (3, [0.0, 1.0])],
        "vec_id long, embedding array<double>",
    )
    picks = kcenter_greedy(three, k=5).collect()
    ids = [r["vec_id"] for r in picks]
    assert len(ids) == len(set(ids)) == 3  # no duplicate picks
