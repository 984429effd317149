from moshpp_tpu.pipeline.stageii import (
    StageIIOptions,
    StageIIResult,
    prepare_stageii_problem,
    mosh_stageii_solve,
)
from moshpp_tpu.pipeline.stagei import (
    StageIOptions,
    StageIResult,
    mosh_stagei_solve,
)
from moshpp_tpu.pipeline.fleet import (
    FleetReport,
    JobResult,
    run_moshpp_fleet,
)
