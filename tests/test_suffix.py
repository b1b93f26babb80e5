"""The fast set-based exact LCS must agree with the suffix-array/Kasai
reference implementation."""

import random

from project_cascade_spark.operators.suffix import (
    _lcs_via_suffix_array,
    common_substring_len,
)


def test_lcs_methods_agree_on_random_strings():
    rng = random.Random(7)
    alphabet = "abcd "
    for _ in range(40):
        a = "".join(rng.choice(alphabet) for _ in range(rng.randint(20, 300)))
        b = "".join(rng.choice(alphabet) for _ in range(rng.randint(20, 300)))
        # plant a shared block in half the cases
        if rng.random() < 0.5:
            block = "".join(rng.choice("xyz") for _ in range(rng.randint(10, 60)))
            ia = rng.randint(0, len(a))
            ib = rng.randint(0, len(b))
            a = a[:ia] + block + a[ia:]
            b = b[:ib] + block + b[ib:]
        truth = _lcs_via_suffix_array(a, b)
        for min_len in (1, 5, 20):
            got = common_substring_len(a, b, min_len)
            if truth >= min_len:
                assert got == truth, (a, b, min_len)
            else:
                assert got == 0


def test_lcs_edge_cases():
    assert common_substring_len("", "", 1) == 0
    assert common_substring_len("abc", "abc", 1) == 3
    assert common_substring_len("abc", "abc", 4) == 0
    assert common_substring_len("abcdef", "xxcdexx", 3) == 3
