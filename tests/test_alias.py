import pytest

from speech_tpu.alias import AliasedFactory, alias_factory_subclass_from_arg


class Base(AliasedFactory):
    pass


class A(Base):
    aliases = {"a", "shared"}

    def __init__(self, x=1, **kwargs):
        self.x = x
        self.kwargs = kwargs


class B(Base):
    aliases = {"b", "shared"}


class BChild(B):
    aliases = {"shared"}


def test_from_alias_finds_subclass():
    assert isinstance(Base.from_alias("a"), A)
    assert isinstance(Base.from_alias("b"), B)


def test_last_registered_wins():
    # BChild registered last among 'shared' claimants and is deepest
    assert isinstance(Base.from_alias("shared"), BChild)


def test_unknown_alias_raises():
    with pytest.raises(ValueError):
        Base.from_alias("nope")


def test_arg_coercion_passthrough():
    a = A()
    assert alias_factory_subclass_from_arg(Base, a) is a


def test_arg_coercion_string():
    assert isinstance(alias_factory_subclass_from_arg(Base, "a"), A)


def test_arg_coercion_mapping_name_and_alias():
    obj = alias_factory_subclass_from_arg(Base, {"name": "a", "x": 5})
    assert isinstance(obj, A) and obj.x == 5
    obj = alias_factory_subclass_from_arg(Base, {"alias": "a", "x": 7})
    assert obj.x == 7
    # 'alias' takes precedence over 'name'
    obj = alias_factory_subclass_from_arg(Base, {"alias": "a", "name": "b"})
    assert isinstance(obj, A)
    assert obj.kwargs == {"name": "b"}


def test_arg_coercion_requires_name():
    with pytest.raises(KeyError):
        alias_factory_subclass_from_arg(Base, {"x": 2})


def test_deprecated_top_level_reexports():
    import warnings

    import speech_tpu

    with warnings.catch_warnings(record=True) as w:
        warnings.simplefilter("always")
        fn = speech_tpu.alias_factory_subclass_from_arg
        cls = speech_tpu.AliasedFactory
    assert fn is speech_tpu.alias.alias_factory_subclass_from_arg
    assert cls is speech_tpu.alias.AliasedFactory
    assert any(issubclass(x.category, DeprecationWarning) for x in w)
    with __import__("pytest").raises(AttributeError):
        speech_tpu.no_such_attr


def test_config_selects_precision_tier():
    """The exact tier is reachable from plain JSON configs through the
    factory — the same path the CLI uses."""
    from speech_tpu.compute import FrameComputer

    cfg = {
        "name": "stft",
        "bank": {"name": "fbank", "num_filts": 8, "sampling_rate": 8000},
        "frame_length_ms": 25,
        "frame_shift_ms": 10,
        "dtype": "float32",
        "precision": "double",
    }
    c = alias_factory_subclass_from_arg(FrameComputer, cfg)
    assert c._precision == "double"
    si = {
        "name": "si",
        "bank": {"name": "fbank", "num_filts": 8, "sampling_rate": 8000},
        "dtype": "float32",
        "precision": "double",
    }
    c2 = alias_factory_subclass_from_arg(FrameComputer, si)
    assert c2._precision == "double"
