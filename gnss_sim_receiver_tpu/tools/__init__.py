"""Standalone utilities (reference src/utils/ parity): obsdiff,
rinex2assist, nav_listener, front_end_cal.  Each is runnable as
`python -m gnss_sim_receiver_tpu.tools.<name>`."""
