from realpdebench_tpu.sim.ns2d import SolverConfig, make_stepper, simulate
