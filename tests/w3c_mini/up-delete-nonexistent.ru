PREFIX : <http://example/>
PREFIX xsd: <http://www.w3.org/2001/XMLSchema#>
DELETE DATA { :s9 :p :o9 }
