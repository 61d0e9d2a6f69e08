from deepsir_tpu.parallel.mesh import make_mesh, batch_sharding, replicated
from deepsir_tpu.parallel.sharded import (make_sharded_train_step,
                                          make_sharded_eval_step,
                                          model_with_mesh_matcher, shard_batch)
from deepsir_tpu.parallel.matching import (make_ring_matcher,
                                           ring_nearest_neighbour_index,
                                           sharded_nearest_neighbour_index)
