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
    monkeypatch.setattr(ks, "SMALL_INPUT_TURNS_MAX", 0)
    dist = run_pipeline_streamed(tpath)
    assert _nodes_norm(driver["nodes"]).equals(_nodes_norm(dist["nodes"]))
    assert _edges_norm(driver["edges"]).equals(_edges_norm(dist["edges"]))


def test_partial_schema_is_fixed_width():
    """The 100-TB guarantee: partials are slim fixed-width rows — no nested
    / list payloads that could grow with corpus size (VERDICT r2 #1)."""
    import pyarrow.types as pt

    from neuroner_ray.pipelines.kg_streamed import _PARTIAL_SCHEMA

    for field in _PARTIAL_SCHEMA:
        assert not pt.is_nested(field.type), field


def test_streamed_source_never_materializes_partials():
    """The corpus-pass output must stream (to the driver or to the disk
    stage), never pin in the object store: no `.materialize()` call may
    touch the partials dataset in run_pipeline_streamed."""
    import inspect

    import neuroner_ray.pipelines.kg_streamed as ks

    src = inspect.getsource(ks.run_pipeline_streamed)
    assert "partials.materialize" not in src
    assert "resolved.materialize" not in src


def test_same_turn_alias_variants_dedup_to_one_edge(tmp_path):
    """O5 regression: two surface variants of the same canonical triple in
    ONE turn must produce edge weight 1, identically in both pipelines."""
    import pyarrow as pa
    import pyarrow.parquet as pq

    text = "Alice Johnson works at Acme Corp . alice johnson works at ACME ."
    t = pa.table(
        {
            "conv_id": ["c1"],
            "turn_idx": pa.array([0], pa.int32()),
            "role": ["user"],
            "text": [text],
            "tool": [""],
            "ts": pa.array([0], pa.timestamp("us")),
        }
    )
    src = tmp_path / "tr"
    src.mkdir()
    pq.write_table(t, str(src / "p.parquet"))
    classic = kg.run_pipeline(str(src))
    streamed = run_pipeline_streamed(str(src))
    a = _edges_norm(classic["edges"])
    b = _edges_norm(streamed["edges"])
    assert a.equals(b), (a, b)
    row = b[b["pred"] == "works_at"].iloc[0]
    assert row["weight"] == 1  # same (conv, turn) counted once
    assert len(row["provenance"]) == 1


def test_streamed_output_invariant_to_batch_size(tpath):
    """Partial aggregation must be batching-invariant: tiny batches and big
    batches produce byte-identical graphs."""
    small = run_pipeline_streamed(tpath, batch_size=64)
    big = run_pipeline_streamed(tpath, batch_size=4096)
    assert _nodes_norm(small["nodes"]).equals(_nodes_norm(big["nodes"]))
    assert _edges_norm(small["edges"]).equals(_edges_norm(big["edges"]))


def test_streamed_handles_edge_free_and_mention_free_corpora(tmp_path):
    """Classic and streamed pipelines must agree on degenerate corpora
    (review finding: pd.concat/pa.concat_tables over empty lists raised)."""
    import pyarrow as pa
    import pyarrow.parquet as pq

    from neuroner_ray.pipelines import kg
    from neuroner_ray.pipelines.kg_streamed import run_pipeline_streamed

    cases = {
        # mentions but no lexicon-matching gaps → nodes, zero edges
        "edge_free": ["Alice Johnson said hello .", "Paris is lovely ."],
        # no gazetteer hits at all → zero nodes, zero edges
        "mention_free": ["nothing to see here .", "entirely plain text ."],
    }
    for name, texts in cases.items():
        d = tmp_path / name
        d.mkdir()
        tab = pa.table(
            {
                "conv_id": pa.array(["c0"] * len(texts), pa.string()),
                "turn_idx": pa.array(range(len(texts)), pa.int32()),
                "role": pa.array(["user"] * len(texts), pa.string()),
                "text": pa.array(texts, pa.string()),
                "tool": pa.array([""] * len(texts), pa.string()),
                "ts": pa.array([0] * len(texts), pa.timestamp("us")),
            }
        )
        pq.write_table(tab, str(d / "part-0.parquet"))
        classic = kg.run_pipeline(str(d))
        streamed = run_pipeline_streamed(str(d))
        assert streamed["nodes"].count() == classic["nodes"].count(), name
        assert streamed["edges"].count() == classic["edges"].count(), name


def test_streamed_distributed_handles_degenerate_corpora(tmp_path, monkeypatch):
    """The staged (large-input) path must survive edge-free and mention-free
    corpora too — empty filtered reads flow into groupbys."""
    import pyarrow as pa
    import pyarrow.parquet as pq

    import neuroner_ray.pipelines.kg_streamed as ks

    monkeypatch.setattr(ks, "SMALL_INPUT_TURNS_MAX", 0)
    cases = {
        "edge_free": ["Alice Johnson said hello .", "Paris is lovely ."],
        "mention_free": ["nothing to see here .", "entirely plain text ."],
    }
    expected_nodes = {"edge_free": 2, "mention_free": 0}
    for name, texts in cases.items():
        d = tmp_path / name
        d.mkdir()
        tab = pa.table(
            {
                "conv_id": pa.array(["c0"] * len(texts), pa.string()),
                "turn_idx": pa.array(range(len(texts)), pa.int32()),
                "role": pa.array(["user"] * len(texts), pa.string()),
                "text": pa.array(texts, pa.string()),
                "tool": pa.array([""] * len(texts), pa.string()),
                "ts": pa.array([0] * len(texts), pa.timestamp("us")),
            }
        )
        pq.write_table(tab, str(d / "part-0.parquet"))
        streamed = run_pipeline_streamed(str(d))
        assert streamed["nodes"].count() == expected_nodes[name], name
        assert streamed["edges"].count() == 0, name


def test_streamed_equals_classic_neural(tpath):
    """Streamed == classic under the NEURAL tagger too — guards the
    per-actor sequence memo (tag results must not depend on batch
    composition or arrival order)."""
    from neuroner_ray.stages.neural_tagger import NeuralTagger

    ckpt = os.path.join(os.path.dirname(__file__), "fixtures", "checkpoint")
    classic = kg.run_pipeline(tpath, tagger=NeuralTagger, tagger_args=(ckpt,))
    streamed = run_pipeline_streamed(
        tpath, tagger=NeuralTagger, tagger_args=(ckpt,), batch_size=64
    )
    assert _nodes_norm(classic["nodes"]).equals(_nodes_norm(streamed["nodes"]))
    a = _edges_norm(classic["edges"])
    b = _edges_norm(streamed["edges"])
    assert a.equals(b), (a.head(), b.head())
