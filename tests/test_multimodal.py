"""Multimodal operator plumbing: stub gating, Arrow batch path, determinism."""

from __future__ import annotations

import pytest

from tests.conftest import SF0001


def test_real_decoders_are_stubbed():
    from ai_to_cvent_etl_spark.operators import multimodal as mm

    with pytest.raises(NotImplementedError):
        mm.decode_image(b"\x89PNG")
    with pytest.raises(NotImplementedError):
        mm.decode_audio(b"RIFF")
    with pytest.raises(NotImplementedError):
        mm.sample_frames(b"\x00\x00\x01\xba")


def test_byte_histogram_counts_all_bytes():
    from ai_to_cvent_etl_spark.operators.multimodal import (
        N_FEATURE_BUCKETS,
        _byte_histogram,
    )

    payload = bytes(range(256))
    hist = _byte_histogram(payload)
    assert len(hist) == N_FEATURE_BUCKETS
    assert sum(hist) == 256
    assert hist == [32] * 8


def test_extract_features_custom_decoder_and_determinism(spark):
    from ai_to_cvent_etl_spark.io import load_table
    from ai_to_cvent_etl_spark.operators.multimodal import (
        attach_payload,
        extract_features,
    )

    docs = load_table(spark, SF0001, "documents").limit(20)
    p = attach_payload(docs)

    # custom decoder is honored (constant vector -> top_bucket = 0 everywhere)
    rows = extract_features(p, decoder=lambda b: [1, 1]).collect()
    assert rows and all(r.top_bucket == 0 and r.features == [1, 1] for r in rows)

    # default path is deterministic across repartitionings (Arrow batch shape
    # must not affect values)
    a = sorted(map(tuple, extract_features(p).collect()))
    b = sorted(map(tuple, extract_features(p.repartition(7)).collect()))
    assert a == b
    assert all(t[2] == sum(t[3]) for t in a)  # n_bytes == histogram mass
