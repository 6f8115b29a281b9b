"""Polynomial layer golden tests -- vectors hand-computed in the reference's
inline tests (cited per test)."""

import pytest

from tpu_zk.fields.arith import field_ctx
from tpu_zk.poly.composed import ProductPolynomial, SumPolynomial
from tpu_zk.poly.multilinear import MultilinearPolynomial
from tpu_zk.poly.univariate import DenseUnivariatePolynomial

FQ = field_ctx("bn254_fq")


def mle(vals, ctx=FQ):
    return MultilinearPolynomial.from_ints(ctx, vals)


def test_new_rejects_non_power_of_two():
    # evaluation_form.rs:171-176
    with pytest.raises(AssertionError, match="power of 2"):
        mle([0, 0, 3, 8, 0, 0])


def test_partial_evaluate():
    # evaluation_form.rs:179-211
    poly = mle([0, 0, 3, 8])
    assert poly.partial_evaluate(0, 6).to_ints() == [18, 48]
    assert poly.partial_evaluate(1, 2).to_ints() == [0, 13]
    assert mle([18, 48]).partial_evaluate(0, 2).to_ints() == [78]
    bigger = mle([0, 0, 0, 3, 0, 0, 2, 5])
    assert bigger.partial_evaluate(2, 3).to_ints() == [0, 9, 0, 11]


def test_evaluate():
    # evaluation_form.rs:214-221
    assert mle([0, 0, 3, 8]).evaluate([6, 2]) == 78


def test_tensor_add_mul():
    # evaluation_form.rs:223-278
    wb = mle([1, 2])
    wc = mle([3, 4])
    assert wb.tensor_add(wc).to_ints() == [4, 5, 5, 6]
    assert mle([2, 3]).tensor_mul(mle([4, 5])).to_ints() == [8, 10, 12, 15]


def test_scalar_mul_add_sum():
    poly = mle([1, 2, 3, 4])
    assert poly.scalar_mul(3).to_ints() == [3, 6, 9, 12]
    assert poly.add(mle([10, 20, 30, 40])).to_ints() == [11, 22, 33, 44]
    assert poly.sum() == 10


def test_convert_to_bytes_be():
    # evaluation_form.rs:35-43: 32 BE bytes per element
    poly = mle([1, 256])
    b = poly.convert_to_bytes()
    assert len(b) == 64
    assert b[:32] == (1).to_bytes(32, "big")
    assert b[32:] == (256).to_bytes(32, "big")


# -- univariate (dense_univariate.rs tests) ----------------------------------


def test_univariate_evaluate():
    # dense_univariate.rs:186-215: [0,0,2,0,0,0,0,3] at 2 -> 392
    poly = DenseUnivariatePolynomial(FQ, [0, 0, 2, 0, 0, 0, 0, 3])
    assert poly.degree() == 7
    assert poly.evaluate(2) == 392


def test_univariate_interpolate():
    # dense_univariate.rs:246-255: (0,2),(1,4),(2,10) -> 2 + 2x^2
    got = DenseUnivariatePolynomial.lagrange_interpolate(FQ, [0, 1, 2], [2, 4, 10])
    assert got.coefficients == [2, 0, 2]


def test_univariate_add_mul():
    from tpu_zk.poly.univariate import add_coeffs, mul_coeffs

    # dense_univariate.rs:218-243
    assert add_coeffs(FQ, [5, 2, 5], [2, 1, 8, 10]) == [7, 3, 13, 10]
    assert mul_coeffs(FQ, [5, 0, 2], [6, 2]) == [30, 10, 12, 4]


# -- composed ----------------------------------------------------------------


def test_product_poly():
    # product_polynomial.rs tests
    p1 = mle([0, 0, 0, 2])
    p2 = mle([0, 0, 0, 3])
    pp = ProductPolynomial.from_mles([p1, p2])
    assert pp.evaluate([1, 2]) == 24
    parts = pp.partial_evaluate(0, 2)
    assert parts.mles()[0].to_ints() == [0, 4]
    assert parts.mles()[1].to_ints() == [0, 6]
    assert pp.multiply_polynomials_element_wise().to_ints() == [0, 0, 0, 6]
    assert pp.degree == 2


def test_product_poly_mismatched_vars():
    with pytest.raises(AssertionError, match="different number of variables"):
        ProductPolynomial.from_mles([mle([0, 2]), mle([0, 0, 0, 3])])


def test_sum_poly():
    # sum_polynomial.rs tests
    pp1 = ProductPolynomial.from_mles([mle([0, 0, 0, 2]), mle([0, 0, 0, 3])])
    pp2 = ProductPolynomial.from_mles([mle([0, 0, 0, 2]), mle([0, 0, 0, 3])])
    sp = SumPolynomial.from_products([pp1, pp2])
    assert sp.degree == 2
    assert sp.number_of_variables == 2
    assert sp.evaluate([1, 2]) == 48
    assert sp.add_polynomials_element_wise().to_ints() == [0, 0, 0, 12]
