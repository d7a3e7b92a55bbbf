{
  "algorithm": "ans",
  "ans_seg_log2": 16,
  "ans_table_mode": "segment",
  "chunk_bounds": [
    0,
    800,
    1600,
    2400,
    3000
  ],
  "chunk_offsets": [
    0,
    3639,
    8429,
    13167,
    17183
  ],
  "chunk_order": "F",
  "comp_level": -1,
  "do_spatial_diff": false,
  "do_time_diff": true,
  "dtype": "int16",
  "n_channels": 17,
  "sample_rate": 800.0,
  "sha1_compressed": "45157da21ff73b33fe6a58d2e92957714e3a36aa",
  "sha1_uncompressed": "4bd395ba23e298b522a1bc30c78a756b61c734b6",
  "shape": [
    3000,
    17
  ],
  "time_diff_order": 2,
  "version": "2.0"
}