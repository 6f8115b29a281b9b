"""Circuit evaluation + wiring MLE golden tests (arithmetic_circuit.rs)."""

from tpu_zk.circuit.layered import (
    Circuit,
    Gate,
    Layer,
    convert_to_binary_and_to_decimal,
    num_of_layer_variables,
)
from tpu_zk.fields.arith import field_ctx

FQ = field_ctx("bn254_fq")


def test_circuit_evaluation():
    # arithmetic_circuit.rs:219-241
    circuit = Circuit(FQ, [
        Layer([Gate.mul(0, 1, 0)]),
        Layer([Gate.add(0, 1, 0), Gate.mul(2, 3, 1)]),
    ])
    result = circuit.evaluate([2, 3, 4, 5])
    assert result.output == [100]
    assert result.layer_evaluations == [[100], [5, 20], [2, 3, 4, 5]]


def test_circuit_evaluation2():
    # arithmetic_circuit.rs:244-266 (switched output index)
    circuit = Circuit(FQ, [
        Layer([Gate.add(0, 1, 0)]),
        Layer([Gate.add(0, 1, 1), Gate.mul(2, 3, 0)]),
    ])
    result = circuit.evaluate([1, 2, 3, 4])
    assert result.output == [15]
    assert result.layer_evaluations == [[15], [12, 3], [1, 2, 3, 4]]


def test_circuit_evaluation3():
    # arithmetic_circuit.rs:269-303
    circuit = Circuit(FQ, [
        Layer([Gate.add(0, 1, 0)]),
        Layer([Gate.add(0, 1, 0), Gate.mul(2, 3, 1)]),
        Layer([Gate.add(0, 1, 0), Gate.mul(2, 3, 1), Gate.mul(4, 5, 2), Gate.mul(6, 7, 3)]),
    ])
    result = circuit.evaluate([1, 2, 3, 4, 5, 6, 7, 8])
    assert result.output == [1695]


def test_num_of_layer_variables():
    # arithmetic_circuit.rs:306-318
    assert [num_of_layer_variables(i) for i in range(5)] == [3, 5, 8, 11, 14]


def test_position_packing():
    # "10001" = 17 and "01011" = 11 (arithmetic_circuit.rs:358-384)
    assert convert_to_binary_and_to_decimal(1, 0, 0, 1) == 1
    assert convert_to_binary_and_to_decimal(1, 1, 0, 1) == 17
    assert convert_to_binary_and_to_decimal(1, 0, 2, 3) == 11


def test_add_i_and_mul_i_mle_layer0():
    # arithmetic_circuit.rs:321-356
    circuit = Circuit(FQ, [
        Layer([Gate.add(0, 1, 0)]),
        Layer([Gate.add(0, 1, 1), Gate.mul(2, 3, 0)]),
    ])
    add_i, mul_i = circuit.add_i_and_mul_i_mle(0)
    assert add_i.to_ints() == [0, 1, 0, 0, 0, 0, 0, 0]
    assert mul_i.to_ints() == [0] * 8


def test_add_i_and_mul_i_mle_layer1():
    # arithmetic_circuit.rs:358-384
    circuit = Circuit(FQ, [
        Layer([Gate.add(0, 1, 0)]),
        Layer([Gate.add(0, 1, 1), Gate.mul(2, 3, 0)]),
    ])
    add_i, mul_i = circuit.add_i_and_mul_i_mle(1)
    expected_add = [0] * 32
    expected_add[17] = 1
    expected_mul = [0] * 32
    expected_mul[11] = 1
    assert add_i.to_ints() == expected_add
    assert mul_i.to_ints() == expected_mul


def test_accumulating_output_index():
    # two gates writing to the same output slot accumulate (+=)
    circuit = Circuit(FQ, [Layer([Gate.add(0, 1, 0), Gate.mul(2, 3, 0)])])
    result = circuit.evaluate([1, 2, 3, 4])
    assert result.output == [(1 + 2) + 3 * 4]
