"""Reference-CLI flag-surface parity (SURVEY.md §5 config row).

Every flag the reference scripts declare must be registered on our
corresponding CLI (either as a live flag or an accepted-and-ignored
compatibility flag), so reference invocation scripts run unmodified.
"""

import argparse
import importlib
import re
from unittest import mock

import pytest

_PAIRS = [
    ("/root/reference/test_generator.py", "hrviton_tpu.cli.test_generator"),
    ("/root/reference/test_condition.py", "hrviton_tpu.cli.test_condition"),
    ("/root/reference/train_condition.py", "hrviton_tpu.cli.train_condition"),
    ("/root/reference/train_generator.py", "hrviton_tpu.cli.train_generator"),
    ("/root/reference/get_norm_const.py", "hrviton_tpu.cli.get_norm_const"),
    ("/root/reference/evaluate.py", "hrviton_tpu.cli.evaluate"),
]


def _reference_flags(path):
    src = open(path).read()
    return sorted(set(re.findall(r"add_argument\(\s*['\"](--[\w\-]+)['\"]",
                                 src)))


def _registered_flags(module_name):
    """All option strings the CLI registers, captured by spying on
    ArgumentParser.add_argument while get_opt builds its parser."""
    captured = set()
    orig = argparse.ArgumentParser.add_argument

    def spy(self, *args, **kwargs):
        for s in args:
            if isinstance(s, str) and s.startswith("-"):
                captured.add(s)
        return orig(self, *args, **kwargs)

    mod = importlib.import_module(module_name)
    argv = ["--name", "x"] if "train" in module_name else []
    with mock.patch.object(argparse.ArgumentParser, "add_argument", spy):
        try:
            mod.get_opt(argv)
        except SystemExit:
            pass
    return captured


@pytest.mark.parametrize("ref_path,module", _PAIRS,
                         ids=[p[1].rsplit(".", 1)[1] for p in _PAIRS])
def test_all_reference_flags_registered(ref_path, module):
    missing = set(_reference_flags(ref_path)) - _registered_flags(module)
    assert not missing, f"reference flags not registered on {module}: {missing}"


def test_ignored_flags_do_not_shadow_live_ones():
    """--fp16 on the train CLIs must stay the live bf16 alias, not a no-op."""
    from hrviton_tpu.cli.train_generator import get_opt
    opt = get_opt(["--name", "x", "--fp16"])
    assert opt.bf16 is True


def test_ignored_flags_accept_values_and_bare_use():
    from hrviton_tpu.cli.test_generator import get_opt
    opt = get_opt(["--cuda", "True", "--gpu_ids", "0", "--fp16"])
    assert opt is not None
