"""README examples must run as written (readme_tests.cpp model)."""

import jax

import simdutf_tpu as su


def test_readme_quickstart():
    assert su.validate_utf8("🙂 héllo".encode()) is True
    r = su.validate_utf8_with_errors(b"ab\xed\xa0\x80")
    assert r.error == su.error_code.SURROGATE and r.count == 2
    out = su.convert_utf8_to_utf16le("héllo".encode())
    assert out == "héllo".encode("utf-16-le")
    assert su.count_utf8("日本語".encode()) == 3
    res, out = su.base64_to_binary(b"aGVs bG8=")
    assert res.is_ok and out == b"hello"
    assert su.autodetect_encoding(b"\xff\xfeh\x00") == su.encoding_type.UTF16_LE


def test_readme_registry():
    impls = su.get_available_implementations()
    assert {"fallback", "xla"} <= set(impls)
    su.set_active_implementation("xla")
    assert su.get_active_implementation().name == "xla"
    su.set_active_implementation("fallback")


def test_readme_sharding():
    from simdutf_tpu.parallel import plan_shards, make_mesh, validate_utf8_sharded

    corpus = "héllo wörld 日本 ".encode() * 500
    plan = plan_shards(corpus, n_shards=len(jax.devices()))
    mesh = make_mesh()
    code, pos = validate_utf8_sharded(plan, mesh)
    assert code == 0 and pos == len(corpus)
