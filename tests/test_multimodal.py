"""Multimodal pipeline: synthetic binary payloads through decode /
feature-extract / resize / frame-sample actor-pool stages. The codec is a
deterministic stub (no media libs in this container); the Ray plumbing —
schema, batch flow, actor signature, list-column output — is real."""

import numpy as np
import pyarrow as pa
import pytest
import ray.data as rd

from apacheorcdotnet_ray.pipelines import multimodal as mm


@pytest.fixture(scope="module")
def media_ds(ray_session):
    base = rd.from_arrow(pa.table({"doc_id": pa.array(np.arange(40, dtype=np.int64))}))
    return mm.synthesize_media(base).materialize()


def test_synthesize_deterministic(ray_session):
    base = rd.from_arrow(pa.table({"doc_id": pa.array(np.arange(10, dtype=np.int64))}))
    a = mm.synthesize_media(base).to_pandas().sort_values("media_id")
    b = mm.synthesize_media(base).to_pandas().sort_values("media_id")
    assert (a["payload"].map(len).values == b["payload"].map(len).values).all()
    assert a.iloc[0]["payload"] == b.iloc[0]["payload"]


def test_decode_roundtrip(media_ds):
    dec = mm.decode_media(media_ds, concurrency=2, batch_size=16).to_pandas()
    src = media_ds.to_pandas().set_index("media_id")
    assert len(dec) == len(src)
    for _, row in dec.iterrows():
        meta = src.loc[row["media_id"]]
        assert row["width"] == meta["width"]
        assert row["height"] == meta["height"]
        assert row["n_frames"] == meta["n_frames"]
        assert len(row["pixels"]) == meta["width"] * meta["height"] * meta["n_frames"]


def test_decoder_rejects_garbage():
    d = mm.MediaDecoder()
    with pytest.raises(ValueError):
        d.decode_one(b"NOTAMEDIAFILE")


def test_features(media_ds):
    feats = mm.extract_features(mm.decode_media(media_ds), batch_size=16).to_pandas()
    assert len(feats) == media_ds.count()
    f0 = np.asarray(feats.iloc[0]["feature"])
    assert f0.shape == (16,)
    assert abs(f0.sum() - 1.0) < 1e-5  # normalized histogram
    assert (feats["mean_pixel"] > 100).all()  # uniform bytes → mean ≈ 127.5


def test_resize(media_ds):
    dec = mm.decode_media(media_ds)
    rs = mm.resize_images(dec, out_w=8, out_h=8).to_pandas()
    for _, row in rs.iterrows():
        assert row["width"] == 8 and row["height"] == 8
        assert len(row["pixels"]) == 8 * 8 * row["n_frames"]


def test_frame_sampling(media_ds):
    dec = mm.decode_media(media_ds)
    sampled = mm.sample_frames(dec, every_n=2).to_pandas()
    src = mm.decode_media(media_ds).to_pandas().set_index("media_id")
    for _, row in sampled.iterrows():
        orig = src.loc[row["media_id"], "n_frames"]
        expect = -(-orig // 2) if orig > 1 else orig  # ceil div for videos
        assert row["n_frames"] == expect
