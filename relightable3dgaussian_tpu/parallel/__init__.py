from .data_parallel import (make_dp_train_step, make_mesh,  # noqa: F401
                            replicate, shard_views)
