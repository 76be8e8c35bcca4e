# Copyright 2026. Apache-2.0.
