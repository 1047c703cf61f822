import numpy as np

from worddiffusion_tpu.data.alphabets import (
    PHOS_SHAPE_TABLES,
    phoc_dim,
    phos_dim,
)
from worddiffusion_tpu.data.phoc import phoc_vector
from worddiffusion_tpu.data.phos import phos_vector, word_shape_counts
from worddiffusion_tpu.data.phosc import phosc_dim, phosc_vector, lexicon_matrix


def test_dims_match_reference():
    # ResPhoSCNetZSL/main.py:65-66 -> phos 165 / phoc 604 (eng)
    assert phos_dim("eng") == 165
    assert phoc_dim("eng") == 604
    assert phosc_dim("eng") == 769
    # ResNet18_j variant (residualmodels.py:266-330): phos 180 / phoc 646
    assert phos_dim("nor") == 180
    assert phoc_dim("nor") == 646


def test_phos_single_char():
    # For a 1-char word every pyramid level has (split-1) empty segments
    # plus one full segment -> the base row appears 5 times at positions
    # 0 and at the end of each level.
    v = phos_vector("a", "eng")
    row = np.asarray(PHOS_SHAPE_TABLES["eng"]["a"], dtype=np.float64)
    assert v.shape == (165,)
    # Level offsets: base at [0:11]; level-2 at 11*(1+1):  [22:33] etc.
    assert np.array_equal(v[0:11], row)
    seg = 1
    for split in range(2, 6):
        seg += split
        assert np.array_equal(v[(seg - 1) * 11 : seg * 11], row)
    assert v.sum() == 5 * row.sum()


def test_phos_golden_independent():
    # Independent recomputation with a different code path.
    word = "the"
    table = PHOS_SHAPE_TABLES["eng"]

    def counts(seg):
        out = np.zeros(11)
        for ch in seg:
            out += np.asarray(table[ch], dtype=float)
        return out

    expected = [counts(word)]
    L = len(word)
    for split in range(2, 6):
        p = L // split
        for m in range(split - 1):
            expected.append(counts(word[m * p : m * p + p]))
        expected.append(counts(word[(split - 1) * p : L]))
    assert np.array_equal(phos_vector(word, "eng"), np.concatenate(expected))


def test_phos_gw_multistroke():
    assert word_shape_counts("m", "gw")[7] == 3
    assert word_shape_counts("m", "eng")[7] == 1


def test_phoc_single_char():
    v = phoc_vector("a", "eng")
    assert v.shape == (604,)
    # 'a' is unigram slot 10; appears once per pyramid segment that
    # contains it (the final segment of each of the 4 levels).
    hits = np.nonzero(v)[0]
    assert all((h % 36) == 10 for h in hits if h < 504)
    assert len(hits) == 4


def test_phoc_case_insensitive():
    assert np.array_equal(phoc_vector("ABC", "eng"), phoc_vector("abc", "eng"))


def test_phoc_nor_special_chars():
    v = phoc_vector("æøå", "nor")
    assert v.shape == (646,)
    assert v.sum() > 0


def test_phosc_concat_and_int_cast():
    v = phosc_vector("word", "eng")
    assert v.shape == (769,)
    vi = phosc_vector("wo_rd", "eng", as_int=True)
    assert vi.dtype == np.int64
    # underscore/space stripped before descriptor computation
    assert np.array_equal(vi, phosc_vector("word", "eng", as_int=True))


def test_lexicon_matrix():
    words, mat = lexicon_matrix(["the", "a", "the", "of"], "eng")
    assert words == ["the", "a", "of"]
    assert mat.shape == (3, 769)
