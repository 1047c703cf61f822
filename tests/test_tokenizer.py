import numpy as np

from worddiffusion_tpu.data.alphabets import ALPHABETS
from worddiffusion_tpu.data.tokenizer import PAD_TOKEN, Tokenizer


def test_vocab_sizes_match_reference():
    # train.py alphabet: 52 classes + PAD -> 53 (sampling.py:86)
    assert Tokenizer.from_name("eng_base", 10).vocab_size == 53
    # trainModifyCondition.py alphabet: 53 classes + PAD -> 54
    assert Tokenizer.from_name("eng_main", 42).vocab_size == 54


def test_encode_shift_and_pad():
    tok = Tokenizer.from_name("eng_main", 10)
    ids = tok.encode("Ab")
    # 'A' index 0 -> 1, 'b' index 27 -> 28, rest PAD
    assert ids.tolist() == [1, 28] + [PAD_TOKEN] * 8
    assert ids.dtype == np.int32


def test_space_becomes_underscore():
    tok = Tokenizer.from_name("eng_main", 6)
    ids = tok.encode("a b")
    underscore = tok.letter2index["_"] + 1
    assert ids[1] == underscore


def test_z_pad_collision_preserved():
    # Reference quirk: 'z' (index 51) encodes to 52 == PAD_TOKEN.
    tok = Tokenizer.from_name("eng_main", 4)
    assert tok.encode("z")[0] == PAD_TOKEN


def test_roundtrip_without_z():
    tok = Tokenizer.from_name("eng_main", 42)
    for word in ["Hello", "getting", "prop", "text"]:
        assert tok.decode(tok.encode(word)) == word


def test_truncation():
    tok = Tokenizer.from_name("eng_main", 4)
    assert len(tok.encode("abcdefgh")) == 4


def test_alphabet_contents():
    assert len(ALPHABETS["eng_base"]) == 52
    assert len(ALPHABETS["eng_main"]) == 53
    assert "æ" in ALPHABETS["nor"] and "å" in ALPHABETS["nor"]
    assert "0" in ALPHABETS["cvl"] and '"' in ALPHABETS["cvl"]


def test_dump_json(tmp_path):
    tok = Tokenizer.from_name("eng_main", 42)
    tok.dump_json(str(tmp_path))
    import json

    with open(tmp_path / "letter2index.json") as f:
        l2i = json.load(f)
    assert l2i["A"] == 0 and l2i["_"] == 52
