"""BERT tokenizer: reference-contract behavior + trie-vs-oracle fuzz.

Contract being pinned: /root/reference/python/hetu/tokenizers/
bert_tokenizer.py (BasicTokenizer 160-267, WordpieceTokenizer 270-323).
"""

import random
import string

import numpy as np
import pytest

from herald_tpu.data.tokenizer import (
    BasicTokenizer, BertTokenizer, WordpieceTokenizer, load_vocab,
    save_vocab,
)

VOCAB = [
    "[PAD]", "[UNK]", "[CLS]", "[SEP]", "[MASK]",
    "un", "##aff", "##able", "run", "##ning", "the", "quick", "brown",
    "fox", ",", ".", "!", "a", "##b", "##c", "want", "##ed", "wa",
    "##nt", "中", "国", "hello", "world", "##s",
]


@pytest.fixture()
def tok(tmp_path):
    p = tmp_path / "vocab.txt"
    p.write_text("\n".join(VOCAB) + "\n", encoding="utf-8")
    return BertTokenizer(str(p))


def test_wordpiece_longest_match_first(tok):
    # greedy longest-first: "wanted" -> want ##ed, not wa ##nt ##ed
    assert tok.tokenize("unaffable") == ["un", "##aff", "##able"]
    assert tok.tokenize("wanted") == ["want", "##ed"]
    assert tok.tokenize("running") == ["run", "##ning"]


def test_unknown_word_is_single_unk(tok):
    # any dead-end position maps the WHOLE word to [UNK]
    assert tok.tokenize("zzz") == ["[UNK]"]
    assert tok.tokenize("runz") == ["[UNK]"]  # 'run' matches, 'z' doesn't


def test_punctuation_splitting_and_lowercase(tok):
    assert tok.tokenize("The quick, brown fox!") == [
        "the", "quick", ",", "brown", "fox", "!"]


def test_accent_stripping(tok):
    assert tok.tokenize("Thé") == ["the"]


def test_cjk_chars_isolated(tok):
    assert tok.tokenize("hello中国world") == ["hello", "中", "国", "world"]


def test_never_split_specials(tok):
    assert tok.basic_tokenizer.tokenize("[CLS] hello [SEP]") == [
        "[CLS]", "hello", "[SEP]"]
    assert tok.tokenize("[MASK]") == ["[MASK]"]


def test_control_chars_removed_whitespace_collapsed(tok):
    assert tok.tokenize("hello\x00� \t\n world\x07") == [
        "hello", "world"]


def test_ids_round_trip(tok):
    toks = tok.tokenize("the quick fox")
    ids = tok.convert_tokens_to_ids(toks)
    assert tok.convert_ids_to_tokens(ids) == toks


def test_max_input_chars_per_word(tok):
    long = "a" * 200
    assert tok.tokenize(long) == ["[UNK]"]


def test_vocab_save_load_round_trip(tok, tmp_path):
    p = tmp_path / "v2.txt"
    save_vocab(tok.vocab, str(p))
    assert load_vocab(str(p)) == tok.vocab


def test_from_pretrained_dir(tmp_path):
    (tmp_path / "vocab.txt").write_text("\n".join(VOCAB), encoding="utf-8")
    t = BertTokenizer.from_pretrained(str(tmp_path))
    assert t.tokenize("running") == ["run", "##ning"]


def test_encode_static_shapes(tok):
    ids, mask, tt = tok.encode("the quick fox", "hello worlds", max_len=16)
    assert ids.shape == mask.shape == tt.shape == (16,)
    assert ids.dtype == np.int32
    n = int(mask.sum())
    got = tok.convert_ids_to_tokens(ids[:n].tolist())
    assert got[0] == "[CLS]" and got.count("[SEP]") == 2
    # token_type 0 through the first [SEP], 1 after
    first_sep = got.index("[SEP]")
    assert set(tt[:first_sep + 1].tolist()) == {0}
    assert set(tt[first_sep + 1:n].tolist()) == {1}
    assert set(ids[n:].tolist()) == {tok.vocab["[PAD]"]}


def test_encode_truncates_longest_first(tok):
    ids, mask, _ = tok.encode("the quick brown fox " * 10,
                              "hello", max_len=12)
    assert int(mask.sum()) == 12  # exactly full, no overflow


def test_encode_batch(tok):
    ids, mask, tt = tok.encode_batch(["the fox", "hello worlds"],
                                     max_len=8)
    assert ids.shape == (2, 8)
    assert mask[1].sum() >= mask[0].sum()


# ---- differential fuzz: trie matcher vs an oracle of the reference ----

def _oracle_wordpiece(vocab, word, unk="[UNK]", max_chars=100):
    """Direct transcription of the reference CONTRACT (not code): at
    each position try the longest substring (with ## when start>0) that
    is in the vocab; no match anywhere -> whole word is UNK."""
    chars = list(word)
    if len(chars) > max_chars:
        return [unk]
    out, start = [], 0
    while start < len(chars):
        end, cur = len(chars), None
        while start < end:
            sub = "".join(chars[start:end])
            if start > 0:
                sub = "##" + sub
            if sub in vocab:
                cur = sub
                break
            end -= 1
        if cur is None:
            return [unk]
        out.append(cur)
        start = end
    return out


def test_wordpiece_fuzz_vs_oracle():
    rng = random.Random(0)
    alpha = "abcde"
    pieces = set()
    for _ in range(60):
        w = "".join(rng.choice(alpha)
                    for _ in range(rng.randint(1, 4)))
        pieces.add(w if rng.random() < 0.4 else "##" + w)
    vocab = {t: i for i, t in enumerate(sorted(pieces) + ["[UNK]"])}
    wp = WordpieceTokenizer(vocab)
    for _ in range(500):
        word = "".join(rng.choice(alpha + "xz")
                       for _ in range(rng.randint(1, 12)))
        assert wp.tokenize(word) == _oracle_wordpiece(vocab, word), word


def test_basic_tokenizer_no_lower():
    bt = BasicTokenizer(do_lower_case=False)
    assert bt.tokenize("Héllo, World") == ["Héllo", ",", "World"]
