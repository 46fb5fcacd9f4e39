"""Minimal test-only stand-in for the handful of diffusers base-class
symbols the reference's *vendored* scheduler file imports
(reference utils/scheduling_euler_discrete_karras_fix.py:22-25).

Purpose: let the parity suite import and execute the reference's actual
scheduler code as an oracle (tests/test_reference_scheduler_oracle.py)
in an environment where diffusers cannot be installed. This implements
only the loading machinery (config registration + attribute forwarding),
none of diffusers' numerics — the numerics under test are the reference
file's own.
"""
