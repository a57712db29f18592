"""GF(2^m) and cyclic-code goldens (reference test_gfields/test_algcode)."""
import numpy as np
from numpy.testing import assert_array_equal

from commpy_tpu.channelcoding import GF, cyclic_code_genpoly


def test_addition():
    m = 3
    x = GF(np.arange(2**m), m)
    y = GF(np.array([6, 4, 3, 1, 2, 0, 5, 7]), m)
    z = np.array([6, 5, 1, 2, 6, 5, 3, 0])
    assert_array_equal((x + y).elements, z)


def test_multiplication():
    m = 3
    x = GF(np.array([7, 6, 5, 4, 3, 2, 1, 0]), m)
    y = GF(np.array([6, 4, 3, 1, 2, 0, 5, 7]), m)
    z = np.array([4, 5, 4, 4, 6, 0, 5, 0])
    assert_array_equal((x * y).elements, z)


def test_closure_small():
    for m in (2, 3):
        x = GF(np.arange(2**m), m)
        for a in x.elements:
            for b in x.elements:
                s = (GF(np.array([a]), m) + GF(np.array([b]), m)).elements[0]
                p = (GF(np.array([a]), m) * GF(np.array([b]), m)).elements[0]
                assert s in x.elements and p in x.elements


def test_tuple_and_power_form():
    m = 3
    assert_array_equal(
        GF(np.arange(0, 2**m - 1), m).power_to_tuple().elements,
        np.array([1, 2, 4, 3, 6, 7, 5]),
    )
    assert_array_equal(
        GF(np.arange(1, 2**m), m).tuple_to_power().elements,
        np.array([0, 1, 3, 2, 6, 4, 5]),
    )
    m = 4
    assert_array_equal(
        GF(np.arange(1, 2**m), m).tuple_to_power().elements,
        np.array([0, 1, 4, 2, 8, 5, 10, 3, 14, 9, 7, 6, 13, 11, 12]),
    )


def test_order():
    m = 4
    assert_array_equal(
        GF(np.arange(1, 2**m), m).order(),
        np.array([1, 15, 15, 15, 15, 3, 3, 5, 15, 5, 15, 5, 15, 15, 5]),
    )


def test_minpols():
    m = 4
    assert_array_equal(
        GF(np.arange(2**m), m).minpolys(),
        np.array([2, 3, 19, 19, 19, 19, 7, 7, 31, 25, 31, 25, 31, 25, 25, 31]),
    )
    m = 6
    x = GF(np.array([2, 8, 32, 6, 24, 35, 10, 40, 59, 41, 14, 37]), m)
    assert_array_equal(
        x.minpolys(),
        np.array([67, 87, 103, 73, 13, 109, 91, 117, 7, 115, 11, 97]),
    )


def test_cyclic_code_genpoly():
    assert_array_equal(
        cyclic_code_genpoly(15, 4), np.array([2479, 3171, 3929])
    )
    assert_array_equal(
        cyclic_code_genpoly(31, 21),
        np.array(
            [1653, 1667, 1503, 1207, 1787, 1561, 1903, 1219, 1137, 2013,
             1453, 1897, 1975, 1395, 1547]
        ),
    )
