"""Golden conlleval pin (FIXTURES.md F6): the frozen checkpoint's report on
the frozen eval slice must reproduce byte-for-byte (F1 to 4 decimals)."""

from __future__ import annotations

import os

from neuroner_ray.functions.conlleval import evaluate, report
from neuroner_ray.functions.labels import bioes_to_bio
from neuroner_ray.state.checkpoint import load_checkpoint
from neuroner_ray.state.train import make_corpus, predict

HERE = os.path.dirname(__file__)


def test_golden_conlleval_report():
    params, vocab = load_checkpoint(os.path.join(HERE, "fixtures", "checkpoint"))
    sents, gold = make_corpus(40, first_conv=50000)
    preds = [bioes_to_bio(predict(params, vocab, s)) for s in sents]
    m = evaluate(gold, preds)
    with open(os.path.join(HERE, "golden", "conlleval.txt")) as f:
        golden = f.read()
    assert report(m) + "\n" == golden
    with open(os.path.join(HERE, "golden", "conlleval_f1.txt")) as f:
        golden_f1 = float(f.read().strip())
    assert f"{m['fb1']:.4f}" == f"{golden_f1:.4f}"


def test_generator_matches_committed_goldens():
    """FIXTURES.md F6: the deterministic generator must keep producing the
    committed golden mention/triple tables (guards silent generator drift,
    which would invalidate every parity threshold)."""
    import pyarrow.parquet as pq

    from neuroner_ray.sources.synth_transcripts import ensure_transcripts

    d = ensure_transcripts(0.0002)
    for name in ("gold_mentions", "gold_triples"):
        got = pq.read_table(f"{d}/{name}.parquet")
        want = pq.read_table(os.path.join(HERE, "golden", f"{name}_sf0.0002.parquet"))
        assert got.equals(want), name
