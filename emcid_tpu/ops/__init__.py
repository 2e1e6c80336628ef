from emcid_tpu.ops.solve import solve_adj_k, upd_matrix_match_shape
