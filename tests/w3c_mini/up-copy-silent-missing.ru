PREFIX : <http://example/>
COPY SILENT :gX TO :g2
