"""Parser tests, including reading the reference's shipped prototxts
unmodified (config-compatibility requirement)."""

import glob
import os

import pytest

from videovector_tpu.config import parse, parse_file

REF_PROJ = "/root/reference/projects/videovec_embedding"


def test_scalars_and_enums():
    msg = parse(
        """
        name: "net"   # comment
        base_lr: 0.001
        max_iter: 200000
        lr_policy: "inv"
        momentum: 0.9
        snapshot_after_train: true
        solver_mode: GPU
        """
    )
    assert msg.get("name") == "net"
    assert msg.get("base_lr") == pytest.approx(0.001)
    assert msg.get("max_iter") == 200000
    assert isinstance(msg.get("max_iter"), int)
    assert msg.get("lr_policy") == "inv"
    assert msg.get("snapshot_after_train") is True
    assert msg.get("solver_mode") == "GPU"


def test_nested_and_repeated():
    msg = parse(
        """
        layers { name: "a" type: SLICE bottom: "x" top: "t1" top: "t2" }
        layers { name: "b" type: CONCAT include: { phase: TRAIN } }
        """
    )
    layers = msg.get_list("layers")
    assert len(layers) == 2
    assert layers[0].get("name") == "a"
    assert layers[0].get_list("top") == ["t1", "t2"]
    assert layers[1].get_msg("include").get("phase") == "TRAIN"


def test_legacy_colon_brace():
    msg = parse('layers { include: { phase: TEST } }')
    assert msg.get_list("layers")[0].get_msg("include").get("phase") == "TEST"


def test_string_escapes_and_concat():
    msg = parse(r'''path: "a\"b" multi: "one" "two"''')
    assert msg.get("path") == 'a"b'
    assert msg.get("multi") == "onetwo"


def test_roundtrip():
    text = 'name: "n"\nlayers {\n  type: SLICE\n  coeff: 0.25\n}'
    msg = parse(text)
    again = parse(msg.dumps())
    assert again.to_dict() == msg.to_dict()


@pytest.mark.skipif(not os.path.isdir(REF_PROJ), reason="reference not mounted")
@pytest.mark.parametrize(
    "path", sorted(glob.glob(os.path.join(REF_PROJ, "*.prototxt"))))
def test_parses_reference_prototxts(path):
    msg = parse_file(path)
    # every net/solver prototxt in the reference project parses and has content
    assert msg.fields


@pytest.mark.skipif(not os.path.isdir(REF_PROJ), reason="reference not mounted")
def test_flagship_net_structure():
    msg = parse_file(os.path.join(REF_PROJ, "mednet_embedding_train.prototxt"))
    layers = msg.get_list("layers")
    names = [l.get("name") for l in layers]
    assert "shot_windows" in names
    data_layer = next(l for l in layers if l.get("type") == "VIDEO_SAMPLED_SHOTS_DATA")
    p = data_layer.get_msg("video_sampled_shots_data_param")
    assert p.get("batch_size") == 128
    assert p.get("num_negative_samples") == 10
    assert p.get("context_type") == "WINDOW"
    assert p.get("context_size") == 5


def test_utf8_and_octal_escaped_strings():
    """Escapes denote BYTES (the reference's TextFormat prints UTF-8 as
    octal byte escapes): both the raw UTF-8 and the octal form must decode
    to the same text, and hex escapes / control escapes work."""
    from videovector_tpu.config.textformat import parse
    assert parse('source: "café"').get("source") == "café"
    assert parse(r'source: "\303\251"').get("source") == "é"
    assert parse(r'source: "q\x41\n"').get("source") == "qA\n"
    # dumps round-trips non-ASCII through the quoted form
    m = parse('source: "café"')
    assert parse(m.dumps()).get("source") == "café"


def test_hex_integer_literals():
    from videovector_tpu.config.textformat import parse
    assert parse("rand_skip: 0x10").get("rand_skip") == 16
    assert parse("rand_skip: 0XFF").get("rand_skip") == 255


def test_keyword_strings_stay_quoted():
    """A string field holding 'true'/'inf'/... must dump quoted, or the
    re-parse changes its type to bool/float."""
    from videovector_tpu.config.textformat import parse
    for word in ("true", "false", "inf", "nan"):
        m = parse(f'source: "{word}"')
        v = parse(m.dumps()).get("source")
        assert v == word and isinstance(v, str), (word, v)
