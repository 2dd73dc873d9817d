"""Host-side utility tests (utils/misc.py)."""

from realpdebench_tpu.utils.misc import env_flag


def test_env_flag_unset_returns_default(monkeypatch):
    monkeypatch.delenv("RPB_TEST_FLAG", raising=False)
    assert env_flag("RPB_TEST_FLAG", default=True) is True
    assert env_flag("RPB_TEST_FLAG", default=False) is False


def test_env_flag_falsy_spellings(monkeypatch):
    for v in ("0", "false", "False", "NO", "off", "", " 0 "):
        monkeypatch.setenv("RPB_TEST_FLAG", v)
        assert env_flag("RPB_TEST_FLAG", default=True) is False, v


def test_env_flag_truthy_spellings(monkeypatch):
    for v in ("1", "true", "TRUE", "yes", "ON"):
        monkeypatch.setenv("RPB_TEST_FLAG", v)
        assert env_flag("RPB_TEST_FLAG", default=False) is True, v


def test_env_flag_garbage_keeps_default(monkeypatch):
    # advisor round-3 finding: a typo must not silently flip a default-on
    # perf lever
    monkeypatch.setenv("RPB_TEST_FLAG", "ture")
    assert env_flag("RPB_TEST_FLAG", default=True) is True
    assert env_flag("RPB_TEST_FLAG", default=False) is False
