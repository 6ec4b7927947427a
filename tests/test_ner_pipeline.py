"""EP2 deploy+evaluate pipeline: CoNLL file → neural tagger → conlleval."""

from __future__ import annotations

import os

import pytest

from neuroner_ray.pipelines.ner import predict_conll, score_predictions
from neuroner_ray.sources.conll import format_sentence, read_conll
from neuroner_ray.state.train import make_corpus

CKPT = os.path.join(os.path.dirname(__file__), "fixtures", "checkpoint")


@pytest.fixture(scope="module")
def conll_file(tmp_path_factory):
    """Held-out corpus written in reference CoNLL format."""
    sents, labels = make_corpus(25, first_conv=30000)
    body = "\n\n".join(
        format_sentence(s, l) for s, l in zip(sents, labels)
    )
    p = tmp_path_factory.mktemp("conll") / "test.txt"
    p.write_text(body + "\n")
    return str(p)


def test_ep2_predict_and_score(conll_file):
    sentences = read_conll(conll_file)
    tagged = predict_conll(sentences, tagger_args=(CKPT,)).materialize()
    scores = score_predictions(tagged)
    assert scores["conlleval"]["fb1"] >= 99.0, scores["conlleval"]
    assert scores["token_report"]["accuracy"] >= 0.99
    # output preserves sentence identity/order keys (O4)
    df = tagged.to_pandas().sort_values(["doc_path", "sent_idx"])
    assert (df["sent_idx"].iloc[:3].to_numpy() == [0, 1, 2]).all()
