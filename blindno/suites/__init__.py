from blindno.suites.registry import SUITES
