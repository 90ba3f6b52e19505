set -x
cd /root/repo/labs
export MAZU_BUILD_TIMING=1
MAZU_GBP_ENGINE=direct MAZU_GBP_W=15 MAZU_GBP_LOAD=0.5 python host_gbp_build.py 300000000 /root/repo/.ckpts/bench_capacity_300m.npz
MAZU_GBP_ENGINE=direct MAZU_GBP_W=17 MAZU_GBP_LOAD=2.0 python host_gbp_build.py 1000000000 /root/repo/.ckpts/g1_direct_w17_L2.npz
MAZU_GBP_ENGINE=fast32 MAZU_GBP_W=19 python host_gbp_build.py 3000000000 /root/repo/.ckpts/g3_fast32_w19.npz
echo DONE_ALL
