"""Language identification — n-gram/stopword heuristic (training-data op).

No external langid model exists in this environment; this is the classic
lightweight approach: score text against per-language marker-word and
character-n-gram profiles, pick the argmax (score ties → the alphabetically
first language; 'und' only when no profile scores above zero).
Deterministic, vocabulary-free, vectorizable per batch. CJK scripts are
detected by codepoint range before profile scoring: Hangul → 'ko', kana →
'ja', remaining Han → 'zh' (Japanese mixes kanji with kana, so any kana
presence wins over Han).
"""

from __future__ import annotations

import re

import pyarrow as pa

_PROFILES: dict[str, set[str]] = {
    "en": {"the", "and", "of", "to", "in", "is", "that", "for", "with", "was"},
    "de": {"der", "die", "das", "und", "ist", "nicht", "mit", "ein", "eine", "zu"},
    "fr": {"le", "la", "les", "et", "est", "une", "que", "pour", "dans", "avec"},
    "es": {"el", "la", "los", "las", "y", "es", "una", "que", "por", "con"},
    "pt": {"o", "os", "e", "um", "uma", "não", "para", "com", "por", "mais"},
    "it": {"il", "la", "e", "che", "di", "un", "una", "per", "non", "sono"},
}
_TRIGRAMS: dict[str, set[str]] = {
    "en": {"the", "ing", "ion", "and", "ent"},
    "de": {"sch", "ich", "ein", "und", "che"},
    "fr": {"les", "ent", "que", "ais", "eur"},
    "es": {"que", "ión", "los", "ado", "nte"},
    "pt": {"ção", "que", "ado", "com", "par"},
    "it": {"che", "zio", "ent", "con", "gli"},
}
_WORD_RE = re.compile(r"[a-zà-ÿ]+")
_HAN_RE = re.compile(r"[一-鿿]")
_KANA_RE = re.compile(r"[぀-ヿ]")
_HANGUL_RE = re.compile(r"[가-힯]")


def detect_language(text: str) -> str:
    if not text:
        return "und"
    han = len(_HAN_RE.findall(text))
    kana = len(_KANA_RE.findall(text))
    hangul = len(_HANGUL_RE.findall(text))
    if han + kana + hangul >= max(1, len(text) // 20):
        if hangul >= max(1, kana):
            return "ko"
        if kana > 0:
            return "ja"
        return "zh"
    words = _WORD_RE.findall(text.lower())
    if not words:
        return "und"
    wset = words  # keep multiplicity — frequency matters
    scores: dict[str, float] = {}
    for lang, markers in _PROFILES.items():
        s = sum(w in markers for w in wset) / len(wset)
        tri = _TRIGRAMS[lang]
        joined = " ".join(words)
        s += 0.1 * sum(
            joined.count(t) for t in tri
        ) / max(1, len(joined) // 3)
        scores[lang] = s
    best = max(sorted(scores), key=lambda k: scores[k])
    return best if scores[best] > 0 else "und"


def langid_batch(batch: pa.Table, text_col: str = "text") -> pa.Table:
    preds = [detect_language(t or "") for t in batch[text_col].to_pylist()]
    return batch.append_column("lang_pred", pa.array(preds, pa.string()))
