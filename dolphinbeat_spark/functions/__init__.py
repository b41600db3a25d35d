from dolphinbeat_spark.functions.hashes import hash64, minhash_params  # noqa: F401
from dolphinbeat_spark.functions.vector import cosine_similarity, dot, l2_norm  # noqa: F401
