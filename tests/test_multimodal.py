"""Multimodal binary-column plumbing: schemas, mapInPandas batch shape,
deterministic fake decode, and the real-decoder stub contract."""

from __future__ import annotations

import hashlib

import numpy as np
import pytest

from recsys_mapreduce_mrjob_spark.operators import multimodal as M


def test_fake_decode_is_deterministic_unit_interval():
    f1 = M.deterministic_fake_decode(b"hello", "image")
    f2 = M.deterministic_fake_decode(b"hello", "image")
    assert np.array_equal(f1, f2)
    assert f1.shape == (M._FEATURE_DIM,)
    assert ((0 <= f1) & (f1 < 1)).all()
    assert not np.array_equal(f1, M.deterministic_fake_decode(b"hellp", "image"))


def test_real_decode_is_marked_stub():
    with pytest.raises(NotImplementedError):
        M._decode_real(b"\x89PNG...", "image")


def test_extract_features_on_synthetic_assets(spark):
    rows = [
        (1, "image", bytearray(b"\x89PNG-ish-bytes"), (64, 64, None, None)),
        (2, "audio", bytearray(b"RIFF-ish-bytes"), (None, None, 16000, None)),
        (3, "video", bytearray(b"\x00\x00ftyp-ish"), (640, 480, None, 300)),
    ]
    assets = spark.createDataFrame(rows, M.ASSET_SCHEMA)
    out = {r.asset_id: r for r in M.extract_features(assets).collect()}
    assert set(out) == {1, 2, 3}
    for aid, _, payload, _ in rows:
        r = out[aid]
        assert r.byte_len == len(payload)
        assert r.payload_sha256 == hashlib.sha256(bytes(payload)).hexdigest()
        expect = M.deterministic_fake_decode(bytes(payload), r.media_type)
        assert np.allclose(r.feature, expect)


def test_documents_adapter_schema(spark, sf_dir):
    assets = M.documents_as_assets(spark, sf_dir)
    fields = {f.name: f.dataType.simpleString() for f in assets.schema.fields}
    assert fields["payload"] == "binary"
    assert fields["media_type"] == "string"
    row = assets.limit(1).collect()[0]
    assert isinstance(bytes(row.payload), bytes)


def test_best_available_decode_falls_back_to_fake_here():
    """This container has no PIL/soundfile, so the probe finds nothing and
    best_available_decode equals the deterministic fake for every type."""
    assert M._probe_decoders() == {}
    for mt in ("image", "audio", "video"):
        assert np.array_equal(
            M.best_available_decode(b"payload", mt),
            M.deterministic_fake_decode(b"payload", mt),
        )


def test_real_decoder_activation_keeps_contract_columns(spark, monkeypatch):
    """When a real decoder IS present (simulated), the same query runs and
    only the feature column changes — asset_id / byte_len / payload_sha256
    stay byte-identical (VERDICT r4 #7 done-criterion)."""
    rows = [
        (1, "image", bytearray(b"\x89PNG-ish-bytes"), (64, 64, None, None)),
        (2, "audio", bytearray(b"RIFF-ish-bytes"), (None, None, 16000, None)),
    ]
    assets = spark.createDataFrame(rows, M.ASSET_SCHEMA)
    base = {r.asset_id: r for r in M.extract_features(assets).collect()}

    def pseudo_real(payload: bytes, media_type: str) -> np.ndarray:
        # stands in for a PIL/soundfile decode: different values, same shape
        return np.full(M._FEATURE_DIM, float(len(payload)))

    swapped = {
        r.asset_id: r
        for r in M.extract_features(assets, decode=pseudo_real).collect()
    }
    assert set(base) == set(swapped)
    for aid in base:
        assert base[aid].byte_len == swapped[aid].byte_len
        assert base[aid].payload_sha256 == swapped[aid].payload_sha256
        assert base[aid].media_type == swapped[aid].media_type
        assert not np.allclose(base[aid].feature, swapped[aid].feature)
