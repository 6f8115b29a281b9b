"""Shamir secret sharing + Fibonacci interpolation demo."""

from tpu_zk.apps.fib import evaluation
from tpu_zk.fields.arith import field_ctx
from tpu_zk.shamir import shamir

FQ = field_ctx("bn254_fq")


def test_recover_secret():
    # shamir_secret_sharing.rs:59-71
    s = shamir.shares(FQ, 17, threshold=4, number_shares=10)
    assert len(s) == 9  # reference loop 1..n yields n-1 shares
    assert shamir.recover_secret(FQ, s) == 17
    assert shamir.recover_secret(FQ, s[:4]) == 17  # any threshold shares work
    assert shamir.recover_secret(FQ, s) != 10


def test_threshold_insufficient_shares():
    s = shamir.shares(FQ, 1234567, threshold=5, number_shares=10)
    assert shamir.recover_secret(FQ, s[:4]) != 1234567  # w.h.p.


def test_s_recover_secret():
    # shamir_s_sharing.rs:66-92
    s = shamir.s_shares(FQ, 17, password=0, threshold=4, number_shares=10)
    assert shamir.s_recover_secret(FQ, s, password=0) == 17
    assert shamir.s_recover_secret(FQ, s, password=0) != 10


def test_s_recover_with_nonzero_password():
    s = shamir.s_shares(FQ, 99, password=42, threshold=3, number_shares=8)
    assert shamir.s_recover_secret(FQ, s, password=42) == 99


def test_fib_evaluation():
    # fib_eval.rs:46-66
    assert evaluation(FQ, 7) == 21
    for x in range(3, 8):
        assert evaluation(FQ, x) == (evaluation(FQ, x - 1) + evaluation(FQ, x - 2)) % FQ.p
