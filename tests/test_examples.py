"""Import-check every examples/*.py script (VERDICT.md Weak #8).

Each script mirrors one reference notebook and guards its body under
__main__, so a plain import exercises all module-level code (imports,
constants) without running a training job.
"""

import glob
import importlib.util
import os

import pytest

EXAMPLES = os.path.join(
    os.path.dirname(os.path.dirname(os.path.abspath(__file__))), "examples")
SCRIPTS = sorted(glob.glob(os.path.join(EXAMPLES, "*.py")))


@pytest.mark.parametrize(
    "path", SCRIPTS, ids=[os.path.basename(p) for p in SCRIPTS])
def test_example_imports(path):
    name = "example_" + os.path.splitext(os.path.basename(path))[0]
    spec = importlib.util.spec_from_file_location(name, path)
    module = importlib.util.module_from_spec(spec)
    spec.loader.exec_module(module)


def test_examples_exist():
    # One script per reference notebook entry point (SURVEY.md C16).
    names = {os.path.basename(p) for p in SCRIPTS}
    assert {"train.py", "evaluate.py", "demo_images.py",
            "export_model.py", "generate_records.py"} <= names
