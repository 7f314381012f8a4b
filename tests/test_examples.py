"""The teaching micro-examples must stay runnable."""

import subprocess
import sys

import pytest

EXAMPLES = ["examples/vector_add.py", "examples/tiled_matmul.py",
            "examples/double_buffered_copy.py",
            "examples/serving_pipeline.py",
            "examples/serving_scaled.py",
            "examples/train_tiny.py",
            "examples/streaming_serving.py",
            "examples/moe_grouped_gemm.py"]


@pytest.mark.parametrize("path", EXAMPLES)
def test_example_runs(path):
    r = subprocess.run([sys.executable, path], capture_output=True,
                       text=True, timeout=600,
                       env={"JAX_PLATFORMS": "cpu", "PATH": "/usr/bin:/bin",
                            "HOME": "/root"})
    assert r.returncode == 0, r.stderr[-800:]
    assert "OK" in r.stdout