"""Native topic-bus broker sources (built on demand).

The Python API lives in :mod:`tpufcn.serve.netbus` (RemoteTopicBus,
start_broker); this package only carries the C++ broker sources so an
installed wheel can build the binary on first use, like the pointmap
node does.
"""
