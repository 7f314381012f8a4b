from tpukern.harness.bench import (
    run_benchmark,
    pretty_print_line,
    time_fn,
    BenchResult,
)

__all__ = ["run_benchmark", "pretty_print_line", "time_fn", "BenchResult"]
