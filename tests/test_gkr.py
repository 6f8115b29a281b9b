"""Full GKR protocol round trips (gkr/src/gkr_protocol.rs tests)."""

from tpu_zk.circuit.layered import Circuit, Gate, Layer
from tpu_zk.fields.arith import field_ctx
from tpu_zk.gkr import protocol

FQ = field_ctx("bn254_fq")


def circuit_two_layers():
    return Circuit(FQ, [
        Layer([Gate.mul(0, 1, 0)]),
        Layer([Gate.add(0, 1, 0), Gate.mul(2, 3, 1)]),
    ])


def circuit_three_layers():
    return Circuit(FQ, [
        Layer([Gate.add(0, 1, 0)]),
        Layer([Gate.mul(0, 1, 0), Gate.add(2, 3, 1)]),
        Layer([Gate.add(0, 1, 0), Gate.add(2, 3, 1), Gate.add(4, 5, 2), Gate.add(6, 7, 3)]),
    ])


def test_gkr_protocol1():
    # gkr_protocol.rs:247-262
    circuit = circuit_two_layers()
    inputs = [2, 3, 4, 5]
    proof = protocol.prove(circuit, inputs)
    assert protocol.verify(circuit, proof, inputs)


def test_gkr_protocol2():
    # gkr_protocol.rs:265-299
    circuit = circuit_three_layers()
    inputs = [1, 2, 3, 4, 5, 6, 7, 8]
    proof = protocol.prove(circuit, inputs)
    assert protocol.verify(circuit, proof, inputs)


def test_gkr_rejects_wrong_inputs():
    circuit = circuit_two_layers()
    proof = protocol.prove(circuit, [2, 3, 4, 5])
    assert not protocol.verify(circuit, proof, [2, 3, 4, 6])


def test_gkr_rejects_tampered_output():
    circuit = circuit_two_layers()
    proof = protocol.prove(circuit, [2, 3, 4, 5])
    proof.circuit_output = [101]
    assert not protocol.verify(circuit, proof, [2, 3, 4, 5])
