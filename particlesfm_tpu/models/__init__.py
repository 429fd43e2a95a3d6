from . import raft
