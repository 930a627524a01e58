from .problems import (HomotopyProblem, IntervalNonlinearProblem,
                       NonlinearFunction, NonlinearLeastSquaresProblem,
                       NonlinearProblem, SCCNonlinearProblem,
                       SteadyStateProblem)
from .returncode import ReturnCode
from .solution import NLStats, NonlinearSolution
from .solve import solve, solve_nonlinear
from .termination import (AbsNormSafeBestTerminationMode,
                          AbsNormSafeTerminationMode, AbsNormTerminationMode,
                          AbsTerminationMode, NormTerminationMode,
                          RelNormSafeBestTerminationMode,
                          RelNormSafeTerminationMode, RelNormTerminationMode,
                          RelTerminationMode, TerminationCondition)
