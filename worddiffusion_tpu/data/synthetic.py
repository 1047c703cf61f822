"""Procedural handwritten-ish word image generator.

The reference trains on IAM/GW/CVL/Norwegian crops that live on the
author's cluster and are not shipped (SURVEY.md §0). This module
renders synthetic 64x256 word images (PIL bitmap font + random affine
jitter + ink noise) so the full train/regenerate/eval stack runs and
benches end-to-end in any environment. Swap in real crops by pointing
``DataConfig.image_dir`` at a directory.
"""

from __future__ import annotations

import zlib

import numpy as np
from PIL import Image, ImageDraw, ImageFont

from .gt import Sample


_FONT_CANDIDATES = (
    "/usr/share/fonts/truetype/dejavu/DejaVuSans.ttf",
    "/usr/share/fonts/dejavu/DejaVuSans.ttf",
    "/usr/share/fonts/TTF/DejaVuSans.ttf",
)
_FONT = None


def _render_font():
    """Deterministic render font. PIL's embedded default font draws
    tofu boxes for non-ASCII glyphs (æøå in the Norwegian alphabet,
    trainNorModifyCondition.py:60-64), which silently turns the
    extended-alphabet chain into a tofu-recognition exercise — prefer
    DejaVuSans (full Latin coverage) and only fall back to the
    embedded font on hosts without it."""
    global _FONT
    if _FONT is None:
        for path in _FONT_CANDIDATES:
            try:
                _FONT = ImageFont.truetype(path, 18)
                break
            except OSError:
                continue
        else:
            _FONT = ImageFont.load_default()
    return _FONT


def stable_seed(name: str) -> int:
    """Deterministic per-name render seed. ``hash(str)`` is randomised
    per process (PYTHONHASHSEED), which would make the latent cache,
    the trainer, and the eval harness each see DIFFERENT pixels for the
    same sample — use this everywhere a sample name seeds a render."""
    return zlib.crc32(name.encode()) & 0x7FFFFFFF


def writer_style(writer: str) -> dict:
    """Deterministic per-writer rendering style (slant, size, ink noise,
    baseline). Gives synthetic corpora a LEARNABLE writer identity — the
    reference's writer conditioning / style-encoder training assume
    writers differ consistently (``feature_extractor.py``); plain
    per-image jitter has no writer signal."""
    rng = np.random.default_rng(stable_seed(f"writer-style|{writer}"))
    return {
        "shear": float((rng.random() - 0.5) * 0.7),
        "h_frac": float(0.45 + 0.3 * rng.random()),
        "noise": float(2.0 + 8.0 * rng.random()),
        "y_off": int(rng.integers(-5, 6)),
        "thickness": int(rng.integers(0, 3)),  # 0 none, 1 dilate, 2 erode
    }


def render_word(
    word: str,
    height: int = 64,
    width: int = 256,
    seed: int = 0,
    jitter: bool = True,
    style: dict | None = None,
) -> np.ndarray:
    """-> uint8 [height, width, 3], black ink on white. ``style`` (from
    :func:`writer_style`) pins the writer-consistent parameters; per-image
    jitter then varies around them."""
    rng = np.random.default_rng(stable_seed(f"{word}|{seed}"))
    font = _render_font()
    # render big, then scale down to the target height
    scratch = Image.new("L", (max(14 * len(word) + 16, 48), 36), 255)
    draw = ImageDraw.Draw(scratch)
    draw.text((4, 4), word, fill=0, font=font)
    arr = np.asarray(scratch)
    cols = np.where((arr < 128).any(axis=0))[0]
    rows = np.where((arr < 128).any(axis=1))[0]
    if len(cols) and len(rows):
        scratch = scratch.crop(
            (cols[0], rows[0], cols[-1] + 1, rows[-1] + 1)
        )
    if style is not None:
        h_frac = style["h_frac"] + (0.04 * (rng.random() - 0.5) if jitter else 0.0)
        target_h = int(height * h_frac)
    elif jitter:
        target_h = int(height * (0.45 + 0.25 * rng.random()))
    else:
        target_h = max(2, height * 3 // 4)
    target_h = max(2, min(height, target_h))
    scale = target_h / scratch.size[1]
    margin = min(8, max(0, width - 4))  # tiny canvases (glyph crops) keep >0 width
    new_w = min(max(width - margin, 2), max(2, int(scratch.size[0] * scale)))
    word_img = scratch.resize((new_w, target_h), Image.BILINEAR)

    if style is not None and style.get("thickness"):
        from PIL import ImageFilter

        word_img = word_img.filter(
            ImageFilter.MinFilter(3) if style["thickness"] == 1
            else ImageFilter.MaxFilter(3)
        )
    if jitter or style is not None:
        if style is not None:
            shear = style["shear"] + (0.06 * (rng.random() - 0.5) if jitter else 0.0)
        else:
            shear = (rng.random() - 0.5) * 0.4
        word_img = word_img.transform(
            word_img.size, Image.AFFINE, (1, shear, 0, 0, 1, 0), fillcolor=255
        )

    canvas = Image.new("L", (width, height), 255)
    max_x = max(1, width - new_w)
    x = int(rng.integers(0, max(1, max_x // 4))) if jitter else (width - new_w) // 2
    y = (height - target_h) // 2 + (int(rng.integers(-4, 5)) if jitter else 0)
    if style is not None:
        y += style["y_off"]
    y = max(0, min(height - target_h, y))
    canvas.paste(word_img, (x, y))

    out = np.asarray(canvas, dtype=np.float32)
    if jitter:
        sigma = style["noise"] if style is not None else 6.0
        out = out + rng.normal(0, sigma, out.shape)
    out = np.clip(out, 0, 255).astype(np.uint8)
    return np.stack([out, out, out], axis=-1)


def synthetic_corpus(
    words: list[str] | None = None,
    writers: int = 8,
    samples_per_word: int = 4,
) -> list[Sample]:
    """A small gt-like corpus for tests and benches."""
    words = words or [
        "the", "of", "and", "text", "getting", "prop", "hand", "writing",
        "word", "diffusion",
    ]
    out = []
    k = 0
    for w in words:
        for j in range(samples_per_word):
            out.append(Sample(image=f"syn-{k:05d}.png", writer=str(k % writers), word=w))
            k += 1
    return out


# A fixed 200-word english list (high-frequency words + the demo probe
# words), used to synthesise recognizer/VAE training corpora with a
# realistic word-length mix. Deterministic: tests and artifacts cite
# indices into it.
WORDS_200 = [
    "the", "of", "and", "text", "getting", "prop", "hand", "writing",
    "word", "diffusion",
    "a", "to", "in", "is", "you", "that", "it", "he", "was", "for",
    "on", "are", "as", "with", "his", "they", "at", "be", "this", "have",
    "from", "or", "one", "had", "by", "not", "but", "what", "all", "were",
    "we", "when", "your", "can", "said", "there", "use", "an", "each",
    "which", "she", "do", "how", "their", "if", "will", "up", "other",
    "about", "out", "many", "then", "them", "these", "so", "some", "her",
    "would", "make", "like", "him", "into", "time", "has", "look", "two",
    "more", "write", "go", "see", "number", "no", "way", "could", "people",
    "my", "than", "first", "water", "been", "call", "who", "oil", "its",
    "now", "find", "long", "down", "day", "did", "get", "come", "made",
    "may", "part", "over", "new", "sound", "take", "only", "little",
    "work", "know", "place", "year", "live", "me", "back", "give", "most",
    "very", "after", "thing", "our", "just", "name", "good", "sentence",
    "man", "think", "say", "great", "where", "help", "through", "much",
    "before", "line", "right", "too", "mean", "old", "any", "same", "tell",
    "boy", "follow", "came", "want", "show", "also", "around", "form",
    "three", "small", "set", "put", "end", "does", "another", "well",
    "large", "must", "big", "even", "such", "because", "turn", "here",
    "why", "ask", "went", "men", "read", "need", "land", "different",
    "home", "us", "move", "try", "kind", "picture", "again", "change",
    "off", "play", "spell", "air", "away", "animal", "house", "point",
    "page", "letter", "mother", "answer", "found", "study", "still",
    "learn", "should", "america", "world",

    # --- appended round 5 (indices 204+): more REAL words so
    # vocabularies past 204 stay natural language. word_list(n)
    # for n <= 204 is UNCHANGED (prefix semantics), so every
    # committed artifact (phosc_syn3/syn4 reproduction) is
    # unaffected; without these, n > 204 fell through to the
    # compound-word fallback ("thethe", "theof") and any unseen
    # eval split drawn there measured out-of-distribution junk
    # (seed-0 syn5 val ZSL 0.265 vs syn3 0.666 - round-5 log).
    "high", "every", "near", "add", "food", "between", "own", "below",
    "country", "plant", "last", "school", "father", "keep", "tree", "never",
    "start", "city", "earth", "eye", "light", "thought", "head", "under",
    "story", "saw", "left", "once", "paper", "together", "got", "group",
    "often", "run", "important", "until", "children", "side", "feet", "car",
    "mile", "night", "walk", "white", "sea", "began", "grow", "took",
    "river", "four", "carry", "state", "book", "hear", "stop", "without",
    "second", "later", "miss", "idea", "enough", "eat", "face", "watch",
    "far", "really", "almost", "let", "above", "girl", "sometimes", "mountain",
    "cut", "young", "talk", "soon", "list", "song", "being", "leave",
    "family", "body", "music", "color", "stand", "sun", "question", "fish",
    "area", "mark", "dog", "horse", "birds", "problem", "complete", "room",
    "knew", "since", "ever", "piece", "told", "usually", "friends", "easy",
    "heard", "order", "red", "door", "sure", "become", "top", "ship",
    "across", "today", "during", "short", "better", "best", "however", "low",
    "hours", "black", "products", "happened", "whole", "measure", "remember", "early",
    "waves", "reached",
]


# Common Norwegian words, biased towards ÆØÅ coverage so synthetic
# corpora exercise the extended alphabet (the reference's Norwegian
# datasets/alphabet: trainNorModifyCondition.py:60-64).
WORDS_NOR = [
    "og", "i", "jeg", "det", "at", "en", "et", "den", "til", "er",
    "som", "på", "de", "med", "han", "av", "ikke", "der", "så", "var",
    "meg", "seg", "men", "ett", "har", "om", "vi", "min", "mitt", "ha",
    "hadde", "hun", "nå", "over", "da", "ved", "fra", "du", "ut", "sin",
    "dem", "oss", "opp", "man", "kan", "hans", "hvor", "eller", "hva",
    "skal", "selv", "sjøl", "her", "alle", "vil", "bli", "ble", "blitt",
    "kunne", "inn", "når", "være", "kom", "noen", "noe", "ville", "dere",
    "deres", "kun", "ja", "etter", "ned", "skulle", "denne", "for",
    "deg", "si", "sine", "sitt", "mot", "å", "meget", "hvorfor", "går",
    "året", "ønske", "første", "væske", "løpe", "kjærlighet", "øy",
    "blå", "grønn", "høst", "vår", "sjø", "født", "død", "brød", "søt",
]


# CVL-style words biased towards the extended alphabet (digits and
# punctuation, ``regenerateFromtrainWord22CVL.py:73`` character set) so
# synthetic corpora exercise the classes plain-English lists never hit.
# Every character is in ``alphabets.CVL`` and none is '_' or leading/
# trailing whitespace (the OCR decode strips both).
WORDS_CVL = [
    "1850", "No.3", "don't", "it's", "well-known", "3rd", "Mr.", "etc.",
    "2+2=4", "why?", "yes!", "(sic)", "12:30", "co-op", "e.g.", "i.e.",
    "1,000", "half;", "A&B", "what?", "stop!", "one-way", "O'Brien",
    "4/5", "page#7", "x=9", "can't", "won't", "isn't", "we're",
    "you're", "they're", "I'm", "he's", "she's", "name:", "first,",
    "last.", "end;", "begin", "letter", "number", "write", "read",
    "hand", "word", "line", "page", "book", "text", "note", "date",
    "year", "1900", "1923", "42nd", "7th", "8vo", "pp.12", "vol.2",
    "fig.5", "sec.9", "ch.10", "art.3", "pt.1", "ed.2", "rev.",
    "op.cit.", "ibid.", "cf.", "viz.", "ca.1800", "b.1812", "d.1870",
    "anno", "circa", "about", "nearly", "almost", "quite", "rather",
    "very", "just", "only", "even", "still", "again", "often",
    "never", "always", "sometimes", "today", "morrow", "yester",
    "night", "day", "week", "month",
]

_WORD_LISTS = {
    "eng": WORDS_200, "gw": WORDS_200, "nor": WORDS_NOR, "cvl": WORDS_CVL,
}


def corpus_lang(data_cfg) -> str:
    """Which word list a preset's synthetic corpora should draw from.

    Keyed on the tokenizer alphabet first (the CVL preset keeps the
    'eng' PHOS tables — digits/punct have no PHOS rows — but its corpus
    must exercise the extended alphabet), falling back to the PHOS
    version (eng/gw/nor presets)."""
    if data_cfg.alphabet in _WORD_LISTS:
        return data_cfg.alphabet
    return data_cfg.phos_version


def word_list(n: int, lang: str = "eng") -> list[str]:
    """First ``n`` words of the fixed per-language list; past its end,
    deterministic compound words, guaranteed UNIQUE (duplicates would
    leak "unseen" words across a zero-shot train/test cut and inflate
    ZSL accuracy)."""
    base = _WORD_LISTS.get(lang, WORDS_200)
    if n <= len(base):
        return base[:n]
    out = list(base)
    seen = set(out)
    i = 0
    while len(out) < n:
        a = base[(i // len(base)) % len(base)]
        b = base[i % len(base)]
        w = a + b
        if i >= len(base) ** 2:  # compound space exhausted
            w = f"{w}{i}"
        i += 1
        if w not in seen:
            seen.add(w)
            out.append(w)
    return out
