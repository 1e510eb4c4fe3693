"""TPU-native image-restoration-agent framework.

A from-scratch JAX/XLA/Pallas/pjit rebuild of the capabilities of
blackbean001/Image-Restoration-Agent (see /root/repo/SURVEY.md):

- ``core``      : fused image pipeline (decode -> normalize -> pad -> tile ->
                  forward -> overlap-blend -> crop) as single XLA programs.
- ``ops``       : shared compute blocks (window attention, MDTA transposed
                  channel attention, SimpleGate, pixel shuffle, DCNv2) with
                  Pallas TPU kernels for the hot paths.
- ``models``    : Flax model zoo (NAFNet, Restormer, SwinIR, DehazeFormer,
                  MPRNet, X-Restormer, HAT, MAXIM, FBCNN, ...).
- ``engine``    : single-process multi-model serving runtime with HBM-LRU
                  weight residency (TPU-native GPUServiceManager).
- ``parallel``  : device-mesh sharding; tile-parallel inference over ICI and
                  dp/fsdp/tp training shardings.
- ``iqa``       : quality metrics (PSNR/SSIM) + degradation classifier.
- ``agent``     : orchestration graph + IRAgent (plan / execute / reflect /
                  rollback / reschedule) mirroring the reference's public
                  behavior (AgenticIR/pipeline/iragent.py).
- ``retrieval`` : experience RAG (embedding store, combiner fusion).
- ``data``      : degradation synthesis (the 8 ops of
                  AgenticIR/dataset/add_single_degradation.py) in numpy/JAX.
- ``api``       : stdlib HTTP serving (/health, /process, /download).
"""

__version__ = "0.1.0"
