"""Generate the JSON spec files (linear-solver-spec.json /
nonlinear-solver-spec.json) from the runtime registries.

The reference embeds its two spec files at build time (CMakeLists.txt:458-475);
here the registry is the source of truth and the JSON files are generated
artifacts shipped as package data — same pointer/type/default/options rule
format, so external tooling that reads the reference's spec format can read
ours."""

import json
import os
import sys

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

import jax

jax.config.update("jax_platforms", "cpu")

from polysolve_tpu.linear.solver import build_linear_spec_rules  # noqa: E402
from polysolve_tpu.nonlinear.solver import build_nonlinear_spec_rules  # noqa: E402


def main():
    out_dir = os.path.join(os.path.dirname(os.path.dirname(os.path.abspath(__file__))),
                           "polysolve_tpu", "specs")
    os.makedirs(out_dir, exist_ok=True)
    for name, rules in [
        ("linear-solver-spec.json", build_linear_spec_rules()),
        ("nonlinear-solver-spec.json", build_nonlinear_spec_rules()),
    ]:
        path = os.path.join(out_dir, name)
        with open(path, "w") as f:
            json.dump(sorted(rules, key=lambda r: r["pointer"]), f, indent=1)
            f.write("\n")
        print(f"wrote {path} ({len(rules)} rules)")


if __name__ == "__main__":
    main()
