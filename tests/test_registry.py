import pytest

from clip_fsar_tpu.utils.registry import Registry


def test_register_and_get():
    reg = Registry("Test")

    @reg.register()
    class Foo:
        pass

    @reg.register(name="Alias")
    def bar():
        return 42

    assert reg.get("Foo") is Foo
    assert reg.get("Alias")() == 42
    assert "Foo" in reg
    assert "Missing" not in reg


def test_duplicate_raises():
    reg = Registry("Test")
    reg.register(name="X")(lambda: 1)
    with pytest.raises(KeyError):
        reg.register(name="X")(lambda: 2)


def test_unknown_lists_known_names():
    reg = Registry("Test")
    reg.register(name="Known")(lambda: 1)
    with pytest.raises(KeyError, match="Known"):
        reg.get("Unknown")
