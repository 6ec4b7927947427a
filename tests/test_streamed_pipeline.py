"""Streamed single-pass pipeline must equal the classic pipeline."""

from __future__ import annotations

import os

import pytest

from neuroner_ray.pipelines import kg
from neuroner_ray.pipelines.kg_streamed import run_pipeline_streamed
from neuroner_ray.sources import synth_transcripts as synth


@pytest.fixture(scope="module")
def tpath():
    return os.path.join(synth.ensure_transcripts(0.0002), "transcripts")


def _nodes_norm(ds):
    df = ds.to_pandas().sort_values("entity_id").reset_index(drop=True)
    df["surfaces"] = df["surfaces"].map(tuple)
    return df


def _edges_norm(ds):
    df = ds.to_pandas().sort_values(["src_id", "dst_id", "pred"]).reset_index(
        drop=True
    )
    df["provenance"] = df["provenance"].map(
        lambda ps: tuple((p["conv_id"], p["turn_idx"]) for p in ps)
    )
    return df


def test_streamed_equals_classic(tpath):
    classic = kg.run_pipeline(tpath)
    streamed = run_pipeline_streamed(tpath)
    assert _nodes_norm(classic["nodes"]).equals(_nodes_norm(streamed["nodes"]))
    a = _edges_norm(classic["edges"])
    b = _edges_norm(streamed["edges"])
    assert a.equals(b), (a.head(), b.head())


def test_streamed_distributed_finalize_equals_driver(tpath, monkeypatch):
    import neuroner_ray.pipelines.kg_streamed as ks

    driver = run_pipeline_streamed(tpath)
    monkeypatch.setattr(ks, "SMALL_PARTIALS_MAX", 0)
    dist = run_pipeline_streamed(tpath)
    assert _nodes_norm(driver["nodes"]).equals(_nodes_norm(dist["nodes"]))
    assert _edges_norm(driver["edges"]).equals(_edges_norm(dist["edges"]))
