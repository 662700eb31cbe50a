"""Run every implementation's internal_tests() through the registry —
the reference's SIMDUTF_INTERNAL_TESTS mechanism (implementation.h:5019,
exercised by src/ppc64/implementation.cpp:899-902)."""

from simdutf_tpu.registry import get_available_implementations


def test_internal_tests(impl_name):
    impl = get_available_implementations()[impl_name]
    for name, fn in impl.internal_tests():
        fn()
