"""CLI entry points mirroring the reference's driver scripts.

Each app is ``python -m e2eslam_tpu.apps.<name> --config_path <yaml> --name
<run>`` (same CLI as the reference's ``utils/arguments.py``). All of them are
thin shells over ``engine.RefinementEngine`` / ``engine.OnlineAdaptation`` —
the five ~800-line cloned reference drivers collapse into these.
"""
