"""OpenMDAO paraboloid driven by the ParOptDriver — the role of the
reference's `examples/openmdao/paraboloid_min.py`:

    min  (x-3)^2 + x y + (y+4)^2 - 3
    s.t. x^2 + y^2 = 27

Requires the real `openmdao` package (not bundled in this image — the CI
exercises the driver against `tests/_fake_openmdao.py` instead; this
script is the real-world entry point).

    python examples/openmdao_paraboloid.py [--algorithm ip|tr|mma]
"""

import argparse
import os
import sys

sys.path.insert(0, os.path.join(os.path.dirname(__file__), ".."))


def main():
    ap = argparse.ArgumentParser()
    ap.add_argument("--algorithm", default="ip", choices=["ip", "tr", "mma"])
    args = ap.parse_args()

    try:
        import openmdao.api as om
    except ImportError:
        sys.exit("openmdao is not installed — see tests/test_drivers.py "
                 "for the stand-in-driven coverage of ParOptDriver")

    from paropt_tpu.drivers.openmdao_driver import ParOptDriver

    prob = om.Problem()
    indeps = prob.model.add_subsystem("indeps", om.IndepVarComp())
    indeps.add_output("x", 3.0)
    indeps.add_output("y", -4.0)
    prob.model.add_subsystem(
        "paraboloid", om.ExecComp("f = (x-3)**2 + x*y + (y+4)**2 - 3"))
    prob.model.add_subsystem("con", om.ExecComp("c = x**2 + y**2"))
    prob.model.connect("indeps.x", "paraboloid.x")
    prob.model.connect("indeps.y", "paraboloid.y")
    prob.model.connect("indeps.x", "con.x")
    prob.model.connect("indeps.y", "con.y")
    prob.model.add_design_var("indeps.x", lower=-50, upper=50)
    prob.model.add_design_var("indeps.y", lower=-50, upper=50)
    prob.model.add_objective("paraboloid.f")
    prob.model.add_constraint("con.c", equals=27.0)

    prob.driver = ParOptDriver()
    prob.driver.options["algorithm"] = args.algorithm
    prob.setup()
    prob.run_driver()

    print("x =", prob.get_val("indeps.x"), " y =", prob.get_val("indeps.y"))
    print("f =", prob.get_val("paraboloid.f"),
          " c =", prob.get_val("con.c"))


if __name__ == "__main__":
    main()
