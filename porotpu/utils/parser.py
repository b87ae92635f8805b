"""CLI parser with the reference's flag surface (lib/Parser.py:15-36).

Produces an ``options_dict`` that *overrides* the driver's parameter dict
via ``parameters.update(parser.options_dict)`` (reference
lib/AbstractPhysics.py:17), completing the 3-tier config chain:
driver dict -> CLI flags -> options file (prefix-keyed DB).
"""

from __future__ import annotations

import argparse

from .options import OptionsDB


class Parser:
    def __init__(self, argv=None):
        ap = argparse.ArgumentParser(add_help=True)
        ap.add_argument("-N", "--Nelements", type=int, dest="N",
                        help="mesh resolution: elements along each side")
        ap.add_argument("--N-refinements", type=int, dest="refinements",
                        help="extra uniform refinement rounds applied to the mesh")
        ap.add_argument("--solver-type", type=str, dest="solver_type",
                        help="outer solver: gmres | cg | aar")
        ap.add_argument("--pc-type", type=str, dest="pc_type",
                        help="block preconditioner variant (lu | undrained | "
                        "diagonal | diagonal 3-way | diagonal 3-way-II | "
                        "undrained 3-way)")
        ap.add_argument("--fe-solid", type=int, dest="fe_s",
                        help="polynomial degree for the displacement space")
        ap.add_argument("--monitor", action="store_true", dest="monitor",
                        help="print per-iteration residuals of the outer solver")
        ap.add_argument("--inner-monitor", action="store_true",
                        dest="inner_monitor",
                        help="print final residuals of each inner (per-field) solve")
        ap.add_argument("--inner-accel-order", type=int,
                        dest="inner_accel_order",
                        help="history window for Anderson-accelerating the PC output (0 = off)")
        ap.add_argument("--output", action="store_true", dest="output",
                        help="write the solution time series to disk (XDMF)")
        ap.add_argument("--time-final", type=float, dest="tf",
                        help="simulation end time (overrides the driver default)")
        ap.add_argument("--petsc-options", type=str, dest="options_file",
                        help="per-prefix solver options file (PETSc options file syntax)")
        ap.add_argument("--dtype", type=str, dest="dtype", default=None,
                        help="Device dtype: float32 or float64")

        options, _ = ap.parse_known_args(argv)

        options_dict = {}
        if options.N:
            options_dict["N"] = options.N
        if options.refinements:
            options_dict["mesh refinements"] = options.refinements
        if options.solver_type:
            options_dict["solver type"] = options.solver_type
        if options.pc_type:
            options_dict["pc type"] = options.pc_type
        if options.fe_s:
            options_dict["fe degree solid"] = options.fe_s
        if options.monitor:
            options_dict["solver monitor"] = True
        if options.inner_monitor:
            options_dict["inner monitor"] = True
        if options.inner_accel_order:
            options_dict["inner accel order"] = options.inner_accel_order
        if options.output:
            options_dict["output solutions"] = True
        if options.tf:
            options_dict["tf"] = options.tf
        if options.dtype:
            options_dict["dtype"] = options.dtype
        if options.options_file:
            options_dict["options db"] = OptionsDB.from_file(options.options_file)
        self.options_dict = options_dict
        self.options = options
