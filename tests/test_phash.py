"""Perceptual hash (operators/multimodal.py): the REAL DCT math on pixel
matrices — locality (small perturbation flips few bits, unrelated images
differ by ~half), resize handling — plus fake-path determinism and the
chunk-blocked pair-join contract used by mm_phash_near_dup."""

from __future__ import annotations

import hashlib

import numpy as np
import pytest

from pdf_extractor_spark.operators.multimodal import (
    PHASH_BITS,
    _fake_phash,
    extract_phash,
    phash_from_gray,
)


def _ham(a: int, b: int) -> int:
    return bin(a ^ b).count("1")


def _base_image(n: int = 64) -> np.ndarray:
    """Structured test image: smooth gradient + a bright block (so the
    low-frequency spectrum is non-degenerate)."""
    y, x = np.mgrid[0:n, 0:n]
    img = (x * 2 + y).astype(np.float64)
    img[10:30, 10:30] += 120.0
    return img


def test_phash_identical_images_hash_equal():
    img = _base_image()
    assert phash_from_gray(img) == phash_from_gray(img.copy())


def test_phash_small_perturbation_flips_few_bits():
    img = _base_image()
    rng = np.random.RandomState(7)
    noisy = img + rng.uniform(-2, 2, img.shape)  # ~1% noise
    d = _ham(phash_from_gray(img), phash_from_gray(noisy))
    assert d <= 6, d


def test_phash_unrelated_images_differ_by_about_half():
    a = _base_image()
    rng = np.random.RandomState(11)
    b = rng.uniform(0, 255, (64, 64))
    d = _ham(phash_from_gray(a), phash_from_gray(b))
    assert d > 15, d


def test_phash_resize_invariance():
    """The same scene at 2x resolution should hash (nearly) identically —
    the property that makes pHash a near-dup signal across re-encodes."""
    small = _base_image(32)
    big = np.kron(small, np.ones((2, 2)))  # exact 2x upscale
    d = _ham(phash_from_gray(small), phash_from_gray(big))
    assert d <= 2, d


def test_phash_non_square_and_tiny_inputs():
    rect = _base_image(64)[:, :40]
    assert 0 <= phash_from_gray(rect) < 2**PHASH_BITS
    tiny = np.arange(64, dtype=np.float64).reshape(8, 8)
    assert 0 <= phash_from_gray(tiny) < 2**PHASH_BITS
    with pytest.raises(ValueError):
        phash_from_gray(np.zeros((0, 4)))


def test_phash_fits_signed_long():
    assert PHASH_BITS <= 63
    img = _base_image()
    assert phash_from_gray(img) < 2**63


def test_fake_phash_matches_md5_definition():
    payload = b"some image bytes \x00\xff"
    want = int(
        hashlib.md5(b"phash:" + payload).hexdigest()[: PHASH_BITS // 4], 16
    )
    assert _fake_phash(payload) == want


def test_extract_phash_plumbing_and_pairs(spark):
    """End-to-end over the distributed path: identical payloads pair at
    hamming 0; unrelated payloads never pair at <=3 of 60 bits."""
    from pdf_extractor_spark.operators.dedup import signature_near_dup_pairs

    rows = [
        (1, b"payload-A"),
        (2, b"payload-A"),  # exact dup of 1
        (3, b"payload-B"),
        (4, b"payload-C"),
        (5, None),  # null payload -> b"" path
        (6, b""),
    ]
    df = spark.createDataFrame(rows, "media_id long, payload binary")
    ph = extract_phash(df, fake=True)
    got = {r.media_id: r.phash for r in ph.collect()}
    assert got[1] == got[2] == _fake_phash(b"payload-A")
    assert got[5] == got[6] == _fake_phash(b"")
    pairs = signature_near_dup_pairs(
        ph.select("media_id", "phash"),
        sig_col="phash",
        id_col="media_id",
        bits=PHASH_BITS,
        n_chunks=4,
        hamming_max=3,
    )
    out = {(r.id_a, r.id_b): r.hamming for r in pairs.collect()}
    assert out == {(1, 2): 0, (5, 6): 0}


def test_extract_phash_decode_error_row(spark):
    """Real-decoder path in this container must yield decode_ok=false error
    rows, never throw the job."""
    df = spark.createDataFrame(
        [(1, b"notanimage")], "media_id long, payload binary"
    )
    row = extract_phash(df, fake=False).collect()[0]
    assert row.decode_ok is False
    assert "NotImplementedError" in row.error
