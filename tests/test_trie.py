"""MPT trie tests against canonical Ethereum test vectors (known roots)."""

import pytest

from ethproof_tpu.trie import rlp
from ethproof_tpu.trie.nibbles import Nibbles
from ethproof_tpu.trie.trie import EMPTY_TRIE_HASH, PartialTrie


def nb(s: bytes) -> Nibbles:
    return Nibbles.from_bytes(s)


class TestRlp:
    def test_known_encodings(self):
        assert rlp.encode(b"dog") == b"\x83dog"
        assert rlp.encode([b"cat", b"dog"]) == b"\xc8\x83cat\x83dog"
        assert rlp.encode(b"") == b"\x80"
        assert rlp.encode([]) == b"\xc0"
        assert rlp.encode(b"\x00") == b"\x00"
        assert rlp.encode(b"\x0f") == b"\x0f"
        assert rlp.encode(b"\x04\x00") == b"\x82\x04\x00"
        long = b"Lorem ipsum dolor sit amet, consectetur adipisicing elit"
        assert rlp.encode(long) == b"\xb8\x38" + long

    def test_roundtrip(self):
        items = [b"cat", [b"puppy", [b""], b"x" * 100], b"", [[]]]
        assert rlp.decode(rlp.encode(items)) == items


class TestNibbles:
    @pytest.mark.parametrize(
        "nibs,is_leaf,expect",
        [
            ((1, 2, 3, 4, 5), False, bytes.fromhex("112345")),
            ((0, 1, 2, 3, 4, 5), False, bytes.fromhex("00012345")),
            ((0, 15, 1, 12, 11, 8), True, bytes.fromhex("200f1cb8")),
            ((15, 1, 12, 11, 8), True, bytes.fromhex("3f1cb8")),
        ],
    )
    def test_hex_prefix_vectors(self, nibs, is_leaf, expect):
        # vectors from the Ethereum yellow paper appendix C
        assert Nibbles(nibs).to_hex_prefix(is_leaf) == expect
        back, leaf = Nibbles.from_hex_prefix(expect)
        assert back == Nibbles(nibs) and leaf == is_leaf


class TestTrie:
    def test_empty_root(self):
        assert PartialTrie().hash() == EMPTY_TRIE_HASH

    def test_single_entry_root(self):
        # ethereum/tests trietest: {"A": "aaaa..."} (hex key 0x41)
        t = PartialTrie()
        t.insert(nb(b"A"), b"aaaaaaaaaaaaaaaaaaaaaaaaaaaaaaaaaaaaaaaaaaaaaaaaaa")
        assert (
            t.hash().hex()
            == "d23786fb4a010da3ce639d66d5e904a11dbc02746d1ce25029e53290cabf28ab"
        )

    def test_anyorder_vector(self):
        # ethereum/tests trieanyorder: do/dog/doge/horse
        kv = {
            b"do": b"verb",
            b"dog": b"puppy",
            b"doge": b"coin",
            b"horse": b"stallion",
        }
        import itertools

        expect = "5991bb8c6514148a29db676a14ac506cd2cd5775ace63c30a4fe457715e9ac84"
        for perm in itertools.permutations(kv.items()):
            t = PartialTrie()
            for k, v in perm:
                t.insert(nb(k), v)
            assert t.hash().hex() == expect, perm

    def test_foo_vector(self):
        t = PartialTrie()
        t.insert(nb(b"foo"), b"bar")
        t.insert(nb(b"food"), b"bass")
        assert (
            t.hash().hex()
            == "17beaa1648bafa633cda809c90c04af50fc8aed3cb40d16efbddee6fdf63c4c3"
        )

    def test_get(self):
        t = PartialTrie()
        t.insert(nb(b"dog"), b"puppy")
        t.insert(nb(b"do"), b"verb")
        assert t.get(nb(b"dog")) == b"puppy"
        assert t.get(nb(b"do")) == b"verb"
        assert t.get(nb(b"cat")) is None

    def test_delete_restores_root(self):
        t = PartialTrie()
        t.insert(nb(b"do"), b"verb")
        t.insert(nb(b"dog"), b"puppy")
        h2 = t.hash()
        t.insert(nb(b"doge"), b"coin")
        t.delete(nb(b"doge"))
        assert t.hash() == h2
        t.delete(nb(b"dog"))
        t.delete(nb(b"do"))
        assert t.hash() == EMPTY_TRIE_HASH

    def test_overwrite(self):
        a, b = PartialTrie(), PartialTrie()
        a.insert(nb(b"k"), b"v1")
        a.insert(nb(b"k"), b"v2")
        b.insert(nb(b"k"), b"v2")
        assert a.hash() == b.hash()

    def test_subset_preserves_root(self):
        t = PartialTrie()
        kv = {
            b"do": b"verb",
            b"dog": b"puppy",
            b"doge": b"coin",
            b"horse": b"stallion",
            b"house": b"building",
        }
        for k, v in kv.items():
            t.insert(nb(k), v)
        sub = t.subset([nb(b"dog")])
        assert sub.hash() == t.hash()
        assert sub.get(nb(b"dog")) == b"puppy"

    def test_subset_insert_still_works(self):
        t = PartialTrie()
        for k, v in [(b"abc", b"1"), (b"abd", b"2"), (b"xyz", b"3")]:
            t.insert(nb(k), v)
        sub = t.subset([nb(b"abc")])
        sub.insert(nb(b"abc"), b"9")
        t.insert(nb(b"abc"), b"9")
        assert sub.hash() == t.hash()
