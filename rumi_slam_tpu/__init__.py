"""rumi_slam_tpu — a TPU-native visual SLAM engine.

A brand-new JAX/XLA/Pallas implementation of the RUMI-SLAM capability set
("Rumination meets VSLAM", T-IE 2023): monocular ORB tracking, local mapping
with windowed bundle adjustment, multi-submap (Atlas) handling on tracking
loss, and the rumination track — a non-realtime back-submap builder whose
result is merged into the realtime maps via timestamp data association, Sim3
alignment, and welding bundle adjustment.

Design stance (vs the reference C++ at /root/reference):
  * pointer-graph map  ->  structure-of-arrays tensors with static capacity
    and validity masks (``mapstate.MapState``);
  * per-frame C++ hot loops  ->  one jitted array program per tracking step;
  * g2o Levenberg-Marquardt  ->  a batched LM engine with Schur-complement
    camera/point elimination in JAX (``optim``);
  * DBoW2 retrieval  ->  brute-force batched Hamming scoring on the MXU;
  * ROS TCP edge/cloud split  ->  a host-staged frame queue feeding a
    rumination shard on separate devices (``rumination``, ``parallel``).
"""

__version__ = "0.1.0"
