from .data_parallel import (combine_stat_contribs,  # noqa: F401
                            make_dp_train_step, make_dp_train_step_stage2,
                            make_mesh, replicate, shard_views)
