"""nonlinearsolve_tpu — a TPU-native nonlinear-solver framework.

A from-scratch JAX/XLA/Pallas re-design with the capabilities of
SciML/NonlinearSolve.jl (see SURVEY.md for the reference's structure this
build follows).  Solvers are pure jit-compilable ``lax.while_loop``
iterations; whole solves vmap/pmap/shard_map.
"""

__version__ = "0.1.0"

from .core import (HomotopyProblem, IntervalNonlinearProblem, NLStats,
                   NonlinearFunction, NonlinearLeastSquaresProblem,
                   NonlinearProblem, NonlinearSolution, ReturnCode,
                   SCCNonlinearProblem, SteadyStateProblem, solve)
from .core.termination import (AbsNormSafeBestTerminationMode,
                               AbsNormSafeTerminationMode,
                               AbsNormTerminationMode, AbsTerminationMode,
                               NormTerminationMode,
                               RelNormSafeBestTerminationMode,
                               RelNormSafeTerminationMode,
                               RelNormTerminationMode, RelTerminationMode,
                               TerminationCondition)
from .solvers import (Broyden, DFSane, FastShortcutNLLSPolyalg,
                      LimitedMemoryBroyden,
                      FastShortcutNonlinearPolyalg, GaussNewton,
                      GeneralizedDFSane, GeneralizedFirstOrderAlgorithm,
                      Klement, LevenbergMarquardt, NewtonRaphson,
                      NonlinearSolvePolyAlgorithm, PseudoTransient,
                      QuasiNewtonAlgorithm, RobustMultiNewton, TrustRegion)
from .core.linesearch import (BackTracking, LiFukushimaLineSearch,
                              RobustNonMonotoneLineSearch)
from .core.wolfe_linesearch import (HagerZhang, LineSearchesJL, MoreThuente,
                                    StaticLineSearch, StrongWolfe)
from .solvers.simple import (SimpleBroyden, SimpleDFSane, SimpleGaussNewton,
                             SimpleHalley, SimpleKlement,
                             SimpleLimitedMemoryBroyden, SimpleNewtonRaphson,
                             SimpleTrustRegion)
from .ops.linear_solve import LinearSolver
from .solvers.bracketing import (Alefeld, Bisection, Brent, Falsi, ITP,
                                 ModAB, Muller, Ridder)
from .solvers.homotopy import (ArcLengthContinuation,
                               FastShortcutHomotopyPolyalg,
                               HomotopyPolyAlgorithm, HomotopySweep,
                               KantorovichHomotopy, SimpleHomotopySweep)
from .solvers.scc import LinearSCCBlock, SCCAlg, scc_solve_up
from .solvers.first_order import (EisenstatWalkerForcing,
                                  EisenstatWalkerForcing2)
from .core.conditioning import PostconditionSpecifier
from .solvers.poly_homotopy import PolynomialHomotopy, solve_polynomial
from .core.autodiff import JacobianPolicy, pickchunksize
from .core.initialization import InitializationData
from .solvers.anderson import AndersonAcceleration
from .solvers.steady_state import DynamicSS, SSRootfind
from .solvers.multistart import polynomialize, solve_multistart
from .core.cache import NonlinearSolveCache, init
from .core.ensemble import EnsembleProblem, solve_ensemble
from .core.tracing import (TraceAll, TraceConfig, TraceMinimal,
                           TraceWithJacobianConditionNumber)
from .solvers.wrappers import (CMINPACK, KINSOL, PETScSNES,
                               FastLevenbergMarquardtJL,
                               FixedPointAccelerationJL, LeastSquaresOptimJL,
                               NLSolversJL, NLsolveJL, SIAMFANLEquationsJL,
                               SciPyLeastSquares, SciPyLeastSquaresDogbox,
                               SciPyLeastSquaresTRF, SciPyRoot,
                               SciPyRootScalar, SpeedMappingJL)
from .core.descent import (DampedNewtonDescent, DescentResult, Dogleg,
                           GeodesicAcceleration, NewtonDescent,
                           SteepestDescent)
from .core.trust_region import (GenericTrustRegionScheme,
                                LevenbergMarquardtTrustRegion,
                                RadiusUpdateSchemes)
from .core.conditioning import PostconditionSpace
from .core.verbosity import NonlinearVerbosity
from .ops.operators import (JacVecOperator, JacobianOperator,
                            StatefulJacobianNormalFormOperator,
                            StatefulJacobianOperator, VecJacOperator)
from .solvers.homotopy_continuation import (HomotopyContinuationJL,
                                            HomotopyNonlinearFunction,
                                            TaylorHomotopyContinuationJL)
from .utils.aot import deserialize_solver, export_solver
from .solvers.refinement import RefineResult, auto_refine, refine_root
