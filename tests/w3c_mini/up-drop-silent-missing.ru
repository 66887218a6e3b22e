PREFIX : <http://example/>
DROP SILENT GRAPH :gX
